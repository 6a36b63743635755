"""Data-contract drift guards for the harness parquet.

Round 3 shipped 24 red queries because events.ts silently changed
physical type (int64 TIMESTAMP(NANOS) -> timestamp[us]) between
sandboxes and the fixed-schema reader reinterpreted micros as nanos,
collapsing 45 days of 2024 data into ~65 minutes of January 1970.
These tests make the NEXT drift an immediate named failure instead of
0-row query outputs with err=null.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from server_spark import tables
from tests.conftest import SF_ORACLE, SF_SMOKE


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
def test_events_ts_physical_type_is_supported(spark, sf_dir):
    """The footer sniffer must classify ts (raises TypeError on drift)."""
    kind = tables.events_ts_kind(spark, f"{sf_dir}/events.parquet")
    assert kind in ("timestamp", "int64_ns")


def test_events_ts_values_are_modern(spark):
    """Whatever the physical encoding, decoded ts must land in the
    synthetic data's real range (2024-era), not epoch-adjacent — the
    exact signature of the r3 micros-as-nanos bug."""
    ev = tables.load(spark, SF_SMOKE, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    assert lo >= datetime.datetime(2020, 1, 1), f"min ts {lo} is epoch-era"
    assert hi < datetime.datetime(2100, 1, 1), f"max ts {hi} is absurd"
    # and the data spans days, not the collapsed ~65 minutes of the bug
    assert (hi - lo) > datetime.timedelta(days=1)


def test_events_range_pushdown_survives(spark):
    """Range bounds must reach the parquet scan as PushedFilters for
    the current encoding (scan pruning is the 100 TB contract)."""
    df = tables.load_events_range(
        spark, SF_SMOKE, "2024-01-05", "2024-01-06"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(ts" in plan
    assert "LessThan(ts" in plan


def test_events_range_matches_oracle_bounds(spark):
    """lo-inclusive / hi-exclusive semantics against a DuckDB twin."""
    import duckdb

    got = tables.load_events_range(
        spark, SF_SMOKE, "2024-01-05", "2024-01-06"
    ).count()
    want = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMOKE}/events.parquet' "
        "WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-06'"
    ).fetchone()[0]
    assert got == want


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
def test_all_table_footers_match_declared_schemas(spark, sf_dir):
    """Every table's parquet footer must carry exactly the declared
    field names and types. Two sanctioned exceptions: events.ts may be
    int64-nanos or timestamp (the footer sniffer branches), and any
    timestamp column may be NTZ in the footer while declared LTZ —
    value-identical ONLY because the session pins UTC, so that pin is
    asserted here too. Everything else drifting is the r3 failure
    mode: a fixed-schema read over a changed footer nulls out or
    reinterprets silently; this test names the drift instead."""
    from pyspark.sql import types as T

    from server_spark.schemas import TABLE_SCHEMAS

    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    ts_types = (T.TimestampType, T.TimestampNTZType)
    for name, declared in TABLE_SCHEMAS.items():
        footer = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
        assert [f.name for f in footer] == [f.name for f in declared], (
            f"{name}: field names drifted: {footer.fieldNames()}"
        )
        for df_field, decl in zip(footer, declared):
            if name == "events" and df_field.name == "ts":
                continue  # int64-nanos and timestamp both sanctioned
            if isinstance(decl.dataType, ts_types):
                assert isinstance(df_field.dataType, ts_types), (
                    f"{name}.{df_field.name}: footer {df_field.dataType} "
                    f"is not a timestamp"
                )
                continue
            assert df_field.dataType == decl.dataType, (
                f"{name}.{df_field.name}: footer {df_field.dataType} "
                f"!= declared {decl.dataType}"
            )


def _write_nanos_events(tmpdir: str, logical: str) -> str:
    """Write a tiny events.parquet whose ts column is int64 nanos —
    either as parquet logical TIMESTAMP(NANOS) (what the early-round
    harness emitted; Spark 4.1 schema inference raises
    PARQUET_TYPE_ILLEGAL on it) or as a plain int64 column. Exercises
    the legacy reader branch that the live testdata no longer covers."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = datetime.datetime(2024, 1, 5, 12, 0, 0)
    ns = [
        int((base + datetime.timedelta(days=d)).timestamp() * 1e9) + 123
        for d in range(4)
    ]
    ts_arr = (
        pa.array(ns, pa.timestamp("ns"))
        if logical == "timestamp_ns"
        else pa.array(ns, pa.int64())
    )
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([10, 11, 10, 12], pa.int64()),
            "event_type": pa.array(["a", "b", "a", "c"], pa.string()),
            "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
            "props": pa.array(["{}"] * 4, pa.string()),
        }
    )
    path = f"{tmpdir}/events.parquet"
    pq.write_table(tbl, path, version="2.6", store_schema=False)
    return path


@pytest.mark.parametrize("logical", ["timestamp_ns", "int64"])
def test_nanos_footer_classified_and_loaded(spark, tmp_path, logical):
    """The pyarrow footer sniff must classify both nanos encodings as
    int64_ns (spark.read-based sniffing dies with PARQUET_TYPE_ILLEGAL
    on TIMESTAMP(NANOS)), and the legacy branch must decode to real
    2024-era timestamps with sub-second precision floored to micros."""
    _write_nanos_events(str(tmp_path), logical)
    assert (
        tables.events_ts_kind(spark, f"{tmp_path}/events.parquet")
        == "int64_ns"
    )
    ev = tables.load(spark, str(tmp_path), "events")
    rows = ev.orderBy("event_id").collect()
    assert rows[0]["ts"] == datetime.datetime(2024, 1, 5, 12, 0, 0)
    assert (rows[-1]["ts"] - rows[0]["ts"]) == datetime.timedelta(days=3)


@pytest.mark.parametrize("logical", ["timestamp_ns", "int64"])
def test_nanos_range_filter_matches_semantics(spark, tmp_path, logical):
    """load_events_range on the legacy branch filters the RAW int64
    column (pushable) with lo-inclusive / hi-exclusive semantics."""
    _write_nanos_events(str(tmp_path), logical)
    df = tables.load_events_range(
        spark, str(tmp_path), "2024-01-06", "2024-01-08"
    )
    got = sorted(r["event_id"] for r in df.collect())
    assert got == [2, 3]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
