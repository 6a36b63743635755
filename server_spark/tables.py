"""Table loaders.

One narrow waist for every read, mirroring how the reference funnels
all storage access through `app/pkg/database/*.go` [M]. Passing the
explicit schema to the parquet reader (a) documents the contract,
(b) fails fast on drift, and (c) lets Catalyst prune columns /
push predicates into the scan — check with ``df.explain("formatted")``
that `ReadSchema` only lists what the query projects.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server_spark.schemas import EVENTS_RAW, TABLE_SCHEMAS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLE_NAMES = tuple(TABLE_SCHEMAS)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table as a DataFrame with its fixed schema."""
    if name not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLE_SCHEMAS)}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS): read the raw int64 and floor
        # to µs (`div` keeps it in exact integer arithmetic — a double
        # division would lose precision above 2^53).
        return (
            spark.read.schema(EVENTS_RAW)
            .parquet(path)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    return spark.read.schema(TABLE_SCHEMAS[name]).parquet(path)


def load_events_range(
    spark: SparkSession,
    sf_dir: str,
    lo: str | None = None,
    hi: str | None = None,
) -> DataFrame:
    """Events with a time-range predicate PUSHED TO THE PARQUET SCAN.

    ``ts`` is physically int64 nanos (Spark's vectorized reader cannot
    map TIMESTAMP(NANOS) to TimestampType), so a filter on the
    converted timestamp column sits above an expression and never
    reaches the scan. Filtering the RAW int64 column first is
    pushable — `PushedFilters: [GreaterThanOrEqual(ts, …)]` — which at
    100 TB is the difference between reading one date range's row
    groups and scanning the table. Bounds are UTC ISO strings,
    lo-inclusive / hi-exclusive, matching the oracle's
    ``ts >= TIMESTAMP lo AND ts < TIMESTAMP hi``.
    """
    import calendar
    from datetime import datetime, timezone

    def _ns(s: str) -> int:
        dt = datetime.fromisoformat(s)
        if dt.tzinfo is not None:
            dt = dt.astimezone(timezone.utc)
        # Exact integer nanos: float .timestamp() loses precision far
        # from epoch, int() truncates sub-seconds (widening the pushed
        # range vs the oracle's bound) and truncates pre-1970 values
        # toward zero instead of flooring.
        return (
            calendar.timegm(dt.timetuple()) * 1_000_000_000
            + dt.microsecond * 1_000
        )

    raw = spark.read.schema(EVENTS_RAW).parquet(
        os.path.join(sf_dir, "events.parquet")
    )
    if lo is not None:
        raw = raw.filter(F.col("ts") >= F.lit(_ns(lo)))
    if hi is not None:
        raw = raw.filter(F.col("ts") < F.lit(_ns(hi)))
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (mirrors the DuckDB oracle's
    pre-registered views) so SQL-form queries can run verbatim."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
