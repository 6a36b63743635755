"""Spark 4 Python DataSource for raw auction dumps: per-file
partitions, gzip + plain JSON, malformed-document tolerance, and
equivalence with the JSON-reader path (sources/json_dump.py)."""

from __future__ import annotations

import gzip
import json

import pytest

from server_spark.sources import dump_datasource as ds

pytestmark = pytest.mark.skipif(
    not ds.HAS_DATASOURCE_API, reason="Python DataSource API absent"
)

DOC1 = {
    "realms": [{"name": "Realm One", "slug": "r1"}],
    "auctions": [
        {"auc": 1, "item": 100, "owner": "a", "ownerRealm": "R1",
         "bid": 10, "buyout": 500, "quantity": 1, "timeLeft": "LONG"},
        {"auc": 2, "item": 101, "owner": "b", "ownerRealm": "R1",
         "bid": 0, "buyout": 900, "quantity": 2, "timeLeft": "SHORT"},
    ],
}
DOC2 = {
    "realms": [{"name": "Realm Two", "slug": "r2"}],
    "auctions": [
        {"auc": 3, "item": 100, "owner": "c", "ownerRealm": "R2",
         "bid": 5, "buyout": 700, "quantity": 1, "timeLeft": "LONG"},
    ],
}


@pytest.fixture
def dump_dir(tmp_path):
    (tmp_path / "d1.json").write_text(json.dumps(DOC1))
    with gzip.open(tmp_path / "d2.json.gz", "wt") as fh:
        json.dump(DOC2, fh)
    (tmp_path / "broken.json").write_text("{not json")
    return str(tmp_path)


def test_reads_plain_and_gzip_per_file_partitions(spark, dump_dir):
    ds.register(spark)
    df = spark.read.format("auction_dump").load(dump_dir)
    rows = sorted(df.collect(), key=lambda r: r["auc"])
    assert [r["auc"] for r in rows] == [1, 2, 3]
    assert rows[0]["realm_slug"] == "r1" and rows[2]["realm_slug"] == "r2"
    assert rows[2]["source_file"] == "d2.json.gz"
    # the malformed file contributes zero rows, not a crash
    assert df.count() == 3
    # one partition per file (gzip is unsplittable; the file is the task)
    reader = ds.AuctionDumpReader({"path": dump_dir})
    assert len(reader.partitions()) == 3


def test_matches_json_reader_path(spark, tmp_path):
    """Same rows as the Spark-JSON parsing path for a well-formed dump."""
    from server_spark.sources.json_dump import read_auction_dump

    p = tmp_path / "dump.json"
    p.write_text(json.dumps(DOC1))
    ds.register(spark)
    got = {
        (r["auc"], r["item"], r["owner"], r["buyout"], r["time_left"])
        for r in spark.read.format("auction_dump").load(str(p)).collect()
    }
    want = {
        (r["auc"], r["item"], r["owner"], r["buyout"], r["time_left"])
        for r in read_auction_dump(
            spark, str(p), region="eu", dump_ts="2024-01-01 00:00:00"
        ).collect()
    }
    assert got == want and len(got) == 2


@pytest.mark.parametrize("simple", [False, True], ids=["partitioned", "simple"])
def test_streaming_poll_loop(spark, tmp_path, simple):
    """The streaming face of the source: batch 1 consumes the files
    present at start; a file that lands later is picked up by a
    resumed run from the SAME checkpoint (offset log), and already-
    consumed dumps are not re-emitted — the reference's poll loop
    with exactly-once offsets. Run against BOTH faces: the default
    partition-planned executor-side reader and the opt-in
    driver-prefetch simple harness (option simple=true)."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (in_dir / "d1.json").write_text(json.dumps(DOC1))

    ds.register(spark)

    def drain():
        reader = spark.readStream.format("auction_dump")
        if simple:
            reader = reader.option("simple", "true")
        q = (
            reader.load(str(in_dir))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            r["auc"] for r in spark.read.parquet(out_dir).collect()
        )

    assert drain() == [1, 2]
    # new dump arrives; resume from checkpoint → only the new rows add
    with gzip.open(in_dir / "d2.json.gz", "wt") as fh:
        json.dump(DOC2, fh)
    assert drain() == [1, 2, 3]
    # replay with nothing new: no duplicates
    assert drain() == [1, 2, 3]


def test_partitioned_stream_plans_per_file_partitions(tmp_path):
    """The partition planner is a pure function of the offset pair:
    one InputPartition per NEW file, none when the offsets agree —
    the driver never touches payload bytes (listing only)."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "d1.json").write_text(json.dumps(DOC1))
    with gzip.open(in_dir / "d2.json.gz", "wt") as fh:
        json.dump(DOC2, fh)

    r = ds.AuctionDumpPartitionedStreamReader({"path": str(in_dir)})
    assert r.initialOffset() == {"files": []}
    end = r.latestOffset()
    assert end == {"files": ["d1.json", "d2.json.gz"]}
    parts = r.partitions(r.initialOffset(), end)
    assert sorted(p.path.rsplit("/", 1)[-1] for p in parts) == [
        "d1.json", "d2.json.gz",
    ]
    # replaying a committed range is deterministic (exactly-once)
    again = r.partitions({"files": []}, end)
    assert [p.path for p in again] == [p.path for p in parts]
    # caught-up: identical offsets plan zero partitions
    assert r.partitions(end, end) == []
    # executor-side read parses one file per partition
    got = sorted(row[0] for p in parts for row in r.read(p))
    assert got == [1, 2, 3]
    # OUT-OF-ORDER arrival: a file sorting BEFORE already-consumed
    # names still gets planned — the offset is a consumed-file SET
    # diff, not a lexicographic high-watermark.
    (in_dir / "a0.json").write_text(json.dumps(DOC1))
    end2 = r.latestOffset()
    late = r.partitions(end, end2)
    assert [p.path.rsplit("/", 1)[-1] for p in late] == ["a0.json"]


def test_writer_roundtrips_wire_format(spark, tmp_path):
    """The writer exports the reference's gzip-JSON wire format:
    read(write(df)) reproduces the rows exactly (camelCase keys and
    all), one document per (realm, task), append vs overwrite
    honored, and staged dot-files are never visible to the reader."""
    out = str(tmp_path / "dumps")
    ds.register(spark)

    rows = [
        (1, 100, "a", "R1", 10, 500, 1, "LONG", "r1"),
        (2, 101, "b", "R1", 0, 900, 2, "SHORT", "r1"),
        (3, 100, "c", "R2", 5, 700, 1, "LONG", "r2"),
    ]
    schema = (
        "auc long, item long, owner string, owner_realm string, "
        "bid long, buyout long, quantity long, time_left string, "
        "realm_slug string"
    )
    df = spark.createDataFrame(rows, schema).repartition("realm_slug")
    df.write.format("auction_dump").option("path", out).mode(
        "append"
    ).save()

    back = spark.read.format("auction_dump").load(out)
    key = (
        "auc", "item", "owner", "owner_realm", "bid", "buyout",
        "quantity", "time_left", "realm_slug",
    )
    assert {tuple(r[k] for k in key) for r in back.collect()} == set(rows)
    # one gzip document per realm after repartition(realm_slug)
    import os as _os

    files = sorted(f for f in _os.listdir(out) if not f.startswith("."))
    assert len(files) == 2 and all(f.endswith(".json.gz") for f in files)

    # append adds; overwrite replaces
    extra = spark.createDataFrame(
        [(9, 300, "z", "R1", 1, 50, 1, "LONG", "r1")], schema
    )
    extra.write.format("auction_dump").option("path", out).mode(
        "append"
    ).save()
    assert spark.read.format("auction_dump").load(out).count() == 4
    extra.write.format("auction_dump").option("path", out).mode(
        "overwrite"
    ).save()
    got = spark.read.format("auction_dump").load(out).collect()
    assert [r["auc"] for r in got] == [9]


def test_stream_writer_epoch_idempotent(spark, tmp_path):
    """Streaming export: rows flow through a writeStream into the wire
    format; a REPLAYED epoch (fresh checkpoint, same input) replaces
    its previous files instead of duplicating them — the epoch-named
    exactly-once contract."""
    import os as _os

    src = str(tmp_path / "src")
    out = str(tmp_path / "dumps")
    schema = (
        "auc long, item long, owner string, owner_realm string, "
        "bid long, buyout long, quantity long, time_left string, "
        "realm_slug string"
    )
    spark.createDataFrame(
        [
            (1, 100, "a", "R1", 10, 500, 1, "LONG", "r1"),
            (2, 101, "b", "R2", 0, 900, 2, "SHORT", "r2"),
        ],
        schema,
    ).write.parquet(src)
    ds.register(spark)

    def run(ckpt):
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.format("auction_dump")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run("ckpt1")
    back = spark.read.format("auction_dump").load(out)
    assert sorted(r["auc"] for r in back.collect()) == [1, 2]
    files1 = sorted(
        f for f in _os.listdir(out) if not f.startswith(".")
    )
    assert all(f.startswith("batch-0-") for f in files1)

    # replay epoch 0 from a fresh checkpoint: files replaced, not added
    run("ckpt2")
    back2 = spark.read.format("auction_dump").load(out)
    assert sorted(r["auc"] for r in back2.collect()) == [1, 2]


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_WIRE_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=10**9),            # auc
        st.integers(min_value=1, max_value=10**6),            # item
        st.one_of(st.none(), st.text(
            alphabet=st.characters(
                whitelist_categories=("L", "N"), max_codepoint=0x24F
            ),
            min_size=1, max_size=12,
        )),                                                    # owner
        st.one_of(st.none(), st.sampled_from(["R1", "R2"])),   # owner_realm
        st.integers(min_value=0, max_value=10**9),             # bid
        st.integers(min_value=0, max_value=10**9),             # buyout
        st.integers(min_value=1, max_value=200),               # quantity
        st.sampled_from(["SHORT", "MEDIUM", "LONG", "VERY_LONG"]),
        st.sampled_from(["r1", "r2", "realm-three"]),          # realm_slug
    ),
    min_size=0,
    max_size=25,
    unique_by=lambda t: t[0],
)


@given(rows=_WIRE_ROWS)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow, HealthCheck.function_scoped_fixture,
    ],
)
def test_dump_writer_roundtrip_property(spark, tmp_path_factory, rows):
    """write→read over the wire format is the identity for ARBITRARY
    auction rows — unicode owners, null owner/ownerRealm, empty
    frames; duplicate-free by auc so set comparison is exact."""
    out = str(tmp_path_factory.mktemp("wire"))
    ds.register(spark)
    schema = (
        "auc long, item long, owner string, owner_realm string, "
        "bid long, buyout long, quantity long, time_left string, "
        "realm_slug string"
    )
    df = spark.createDataFrame(rows, schema) if rows else (
        spark.createDataFrame([], schema)
    )
    df.write.format("auction_dump").option("path", out).mode(
        "overwrite"
    ).save()
    back = spark.read.format("auction_dump").load(out)
    key = (
        "auc", "item", "owner", "owner_realm", "bid", "buyout",
        "quantity", "time_left", "realm_slug",
    )
    assert {tuple(r[k] for k in key) for r in back.collect()} == set(rows)
