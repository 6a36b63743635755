"""Structured Streaming pipeline tests: file-source intake, watermark
dedup, tumbling aggregation, checkpoint resume, stateful delta."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from server_spark.schemas import AUCTION
from server_spark.streaming import pipeline as sp

# r15 (VERDICT r14 item 2): every test here spins REAL streaming
# queries with wall-clock trigger/watermark waits — 444 s of the
# 41-min full suite, the single biggest block past the already-marked
# gates. Streaming is untouched by query-plan work; the full suite
# (including this file) still runs at round close (`pytest -m ""`,
# recorded in SCALE.md).
pytestmark = pytest.mark.slow


def _dump(spark, ts, rows):
    data = [
        (auc, item, "o", "r1", 9, buyout, qty, "LONG", "eu", "r1", ts)
        for auc, item, buyout, qty in rows
    ]
    return spark.createDataFrame(data, AUCTION)


def _write_dump(spark, input_dir, name, ts, rows):
    _dump(spark, ts, rows).coalesce(1).write.mode("append").parquet(input_dir)


def test_streaming_intake_and_resume(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir, exist_ok=True)

    t0 = dt.datetime(2024, 1, 1, 10, 30)
    _write_dump(spark, input_dir, "d0", t0, [(1, 100, 100, 1), (2, 100, 300, 1)])

    stream = sp.hourly_price_stream(
        sp.dedup_dumps(sp.read_auction_stream(spark, input_dir), late="0 seconds")
    )
    # run 1: watermark reaches 10:30 — the 10:00 window is still open,
    # so append mode emits nothing yet (correct watermark semantics)
    q = sp.run_to_parquet(stream, out_dir, ckpt)
    q.awaitTermination()

    def _read_out():
        try:
            return {r["bucket_ts"]: r for r in spark.read.parquet(out_dir).collect()}
        except Exception:  # noqa: BLE001 — no files yet
            return {}

    assert _read_out() == {}

    # run 2: a 12:15 snapshot lands; checkpoint resume processes ONLY
    # the new file, watermark passes 11:00 → the 10:00 bucket emits
    t1 = dt.datetime(2024, 1, 1, 12, 15)
    _write_dump(spark, input_dir, "d1", t1, [(3, 100, 500, 5)])
    q2 = sp.run_to_parquet(stream, out_dir, ckpt)
    q2.awaitTermination()

    rows = _read_out()
    assert list(rows) == [dt.datetime(2024, 1, 1, 10)]
    assert rows[dt.datetime(2024, 1, 1, 10)]["volume"] == 2

    # run 3: a later snapshot closes the 12:00 bucket; 10:00 bucket is
    # not re-emitted (exactly-once via checkpoint)
    t2 = dt.datetime(2024, 1, 1, 14, 5)
    _write_dump(spark, input_dir, "d2", t2, [(4, 100, 700, 7)])
    q3 = sp.run_to_parquet(stream, out_dir, ckpt)
    q3.awaitTermination()

    rows = _read_out()
    assert set(rows) == {dt.datetime(2024, 1, 1, 10), dt.datetime(2024, 1, 1, 12)}
    assert rows[dt.datetime(2024, 1, 1, 12)]["volume"] == 5


def test_stateful_price_delta(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir, exist_ok=True)

    t0 = dt.datetime(2024, 1, 1, 10)
    t1 = dt.datetime(2024, 1, 1, 11)
    # snapshot 1: item 100 avg 100; snapshot 2: avg 150 → delta 50
    _write_dump(spark, input_dir, "d0", t0, [(1, 100, 100, 1)])
    _write_dump(spark, input_dir, "d1", t1, [(2, 100, 150, 1)])

    stream = sp.price_delta_stateful(sp.read_auction_stream(spark, input_dir))
    q = sp.run_to_parquet(stream, out_dir, ckpt, mode="append")
    q.awaitTermination()

    rows = sorted(
        spark.read.parquet(out_dir).collect(), key=lambda r: r["dump_ts"]
    )
    assert [r["avg_buyout_per"] for r in rows] == [100.0, 150.0]
    assert rows[0]["prev_avg"] is None and rows[0]["delta"] is None
    assert rows[1]["prev_avg"] == 100.0 and rows[1]["delta"] == 50.0


def test_stream_ingest_manifest_idempotent(spark, tmp_path):
    """foreachBatch + manifest intake: the stream lands dumps into
    bronze once; replaying the same files with a WIPED checkpoint (the
    checkpoint can no longer dedupe) still cannot double-land them —
    the manifest gate holds."""
    import shutil

    from server_spark.plans.medallion import MedallionPaths, load_manifest

    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    paths = MedallionPaths(str(tmp_path / "lake"))
    os.makedirs(input_dir, exist_ok=True)

    t0 = dt.datetime(2024, 1, 1, 10, 30)
    t1 = dt.datetime(2024, 1, 1, 11, 30)
    _write_dump(spark, input_dir, "d0", t0, [(1, 100, 100, 1), (2, 100, 300, 1)])
    _write_dump(spark, input_dir, "d1", t1, [(3, 200, 500, 2)])

    q = sp.stream_ingest_with_manifest(spark, input_dir, paths, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(paths.bronze).count() == 3
    assert load_manifest(spark, paths).count() == 2  # two dump keys

    # checkpoint wiped → the file source replays EVERYTHING; bronze
    # must not grow
    shutil.rmtree(ckpt)
    q = sp.stream_ingest_with_manifest(spark, input_dir, paths, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(paths.bronze).count() == 3
    assert load_manifest(spark, paths).count() == 2


def test_streaming_session_window(spark, tmp_path):
    """T4 streaming: events within the gap merge into one session that
    emits once the watermark passes; a later burst stays open."""
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir, exist_ok=True)

    t0 = dt.datetime(2024, 1, 1, 10, 0)
    t1 = dt.datetime(2024, 1, 1, 10, 10)  # same session (gap 30m)
    _write_dump(spark, input_dir, "d0", t0, [(1, 100, 100, 1)])
    _write_dump(spark, input_dir, "d1", t1, [(2, 100, 300, 1)])

    stream = sp.session_stream(
        sp.read_auction_stream(spark, input_dir), gap="30 minutes", late="0 seconds"
    )
    q = sp.run_to_parquet(stream, out_dir, ckpt)
    q.awaitTermination()

    # a much later dump advances the watermark past the first
    # session's end → it closes and emits on the resumed run
    t2 = dt.datetime(2024, 1, 1, 13, 0)
    _write_dump(spark, input_dir, "d2", t2, [(3, 100, 500, 1)])
    q2 = sp.run_to_parquet(stream, out_dir, ckpt)
    q2.awaitTermination()

    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["owner"] == "o"
    assert r["session_start"] == t0
    assert r["session_end"] == dt.datetime(2024, 1, 1, 10, 40)  # t1 + gap
    assert r["n_auctions"] == 2


def test_stream_stream_lifetime_join(spark, tmp_path):
    """Posts x removals interval join: a removal within the 2h bound
    emits a time-to-sale row; one beyond the bound never joins."""
    posts_dir = str(tmp_path / "posts")
    rm_dir = str(tmp_path / "rm")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    t0 = dt.datetime(2024, 1, 1, 10, 0)
    _write_dump(
        spark, posts_dir, "d0", t0,
        [(1, 100, 500, 1), (2, 100, 900, 1), (3, 200, 700, 1)],
    )
    removals = spark.createDataFrame(
        [
            (1, t0 + dt.timedelta(minutes=30)),   # sold within bound
            (2, t0 + dt.timedelta(hours=5)),      # beyond 2h: no join
            (3, t0 - dt.timedelta(minutes=5)),    # before posting: no join
        ],
        "auc long, removed_ts timestamp",
    )
    removals.coalesce(1).write.mode("append").parquet(rm_dir)

    posts = sp.read_auction_stream(spark, posts_dir)
    rm_stream = (
        spark.readStream.schema("auc long, removed_ts timestamp").parquet(rm_dir)
    )
    joined = sp.auction_lifetime_stream(posts, rm_stream, within_hours=2)
    q = sp.run_to_parquet(joined, out_dir, ckpt)
    q.awaitTermination()

    rows = spark.read.parquet(out_dir).collect()
    assert [(r["auc"], r["seconds_listed"]) for r in rows] == [(1, 1800)]


def test_streaming_incremental_dedup(spark, tmp_path):
    """Arriving docs are classified against the standing corpus by a
    stream-static broadcast join — duplicates of base content flag
    exact_dup, fresh content flags unique, across micro-batches."""
    import json as _json

    from server_spark.streaming.pipeline import incremental_dedup_stream

    base = spark.createDataFrame(
        [(i, f"standing corpus document number {i} body") for i in range(20)],
        "doc_id long, text string",
    )
    inp = tmp_path / "incoming"
    inp.mkdir()
    # batch 1: two dups of base docs (normalized-equal text), one new
    (inp / "b1.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"doc_id": 100, "text": "standing corpus document number 3 body"},
                {"doc_id": 101, "text": "  Standing Corpus Document Number 7 Body  "},
                {"doc_id": 102, "text": "genuinely new content alpha"},
            ]
        )
    )
    # batch 2 (separate file → separate micro-batch): one more of each
    (inp / "b2.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"doc_id": 103, "text": "standing corpus document number 11 body"},
                {"doc_id": 104, "text": "genuinely new content beta"},
            ]
        )
    )
    q = incremental_dedup_stream(
        spark,
        str(inp),
        base,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["verdict"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {
        100: "exact_dup",
        101: "exact_dup",  # normalization: case + whitespace folded
        102: "unique",
        103: "exact_dup",
        104: "unique",
    }


def test_late_data_dropped_after_watermark(spark, tmp_path):
    """T6: an event stamped OLDER than the advanced watermark is
    dropped — the already-emitted window neither re-emits nor mutates
    (its state was evicted), and the late row opens no new window.
    This pins the late-data policy the pipeline docstring promises."""
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir, exist_ok=True)

    stream = sp.hourly_price_stream(
        sp.dedup_dumps(sp.read_auction_stream(spark, input_dir), late="0 seconds")
    )

    t0 = dt.datetime(2024, 1, 1, 10, 30)
    _write_dump(spark, input_dir, "d0", t0, [(1, 100, 100, 1)])
    sp.run_to_parquet(stream, out_dir, ckpt).awaitTermination()

    # advance the watermark to 12:15 → the 10:00 bucket closes and
    # emits with volume 1
    t1 = dt.datetime(2024, 1, 1, 12, 15)
    _write_dump(spark, input_dir, "d1", t1, [(2, 100, 500, 5)])
    sp.run_to_parquet(stream, out_dir, ckpt).awaitTermination()

    rows = {r["bucket_ts"]: r for r in spark.read.parquet(out_dir).collect()}
    assert list(rows) == [dt.datetime(2024, 1, 1, 10)]
    assert rows[dt.datetime(2024, 1, 1, 10)]["volume"] == 1

    # LATE arrival: stamped 10:45, far behind the 12:15 watermark —
    # its window already emitted, so the row must be discarded
    t_late = dt.datetime(2024, 1, 1, 10, 45)
    _write_dump(spark, input_dir, "d2", t_late, [(3, 100, 700, 7)])
    sp.run_to_parquet(stream, out_dir, ckpt).awaitTermination()

    rows = {r["bucket_ts"]: r for r in spark.read.parquet(out_dir).collect()}
    assert list(rows) == [dt.datetime(2024, 1, 1, 10)]
    assert rows[dt.datetime(2024, 1, 1, 10)]["volume"] == 1  # unchanged

    # sanity: on-time traffic still flows — a 14:05 dump closes the
    # 12:00 bucket with ONLY the on-time row
    t2 = dt.datetime(2024, 1, 1, 14, 5)
    _write_dump(spark, input_dir, "d3", t2, [(4, 100, 900, 9)])
    sp.run_to_parquet(stream, out_dir, ckpt).awaitTermination()

    rows = {r["bucket_ts"]: r for r in spark.read.parquet(out_dir).collect()}
    assert set(rows) == {
        dt.datetime(2024, 1, 1, 10),
        dt.datetime(2024, 1, 1, 12),
    }
    assert rows[dt.datetime(2024, 1, 1, 12)]["volume"] == 5


def test_streaming_index_assign(spark, tmp_path):
    """x51 streaming twin: embedding batches landing as files are
    assigned to the standing index continuously; assignments match
    the batch operator and the drift column is populated."""
    import json as _json

    import numpy as np
    from pyspark.sql import functions as F

    from server_spark.queries.ext_common import _emb
    from server_spark.similarity.ivf import assign_batch, build_index
    from server_spark.streaming.pipeline import index_assign_stream
    from tests.conftest import SF_SMOKE

    emb = _emb(spark, SF_SMOKE)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    idx = build_index(base, n_clusters=8, cache=False, n_assign=1)
    base_d2 = assign_batch(idx, base).agg(F.avg("_d2")).first()[0]

    arriving = emb.filter(F.col("vec_id") % 2 == 1).limit(40).collect()
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, half in enumerate((arriving[:20], arriving[20:])):
        with open(in_dir / f"batch{i}.json", "w") as f:
            for r in half:
                f.write(
                    _json.dumps(
                        {"vec_id": r["vec_id"], "embedding": list(r["embedding"])}
                    )
                    + "\n"
                )
    q = index_assign_stream(
        spark,
        str(in_dir),
        idx,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        base_d2,
    )
    q.awaitTermination(120)
    got = {
        r["vec_id"]: r for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert len(got) == 40
    want = {
        r["vec_id"]: r
        for r in assign_batch(
            idx, emb.filter(F.col("vec_id") % 2 == 1).limit(40)
        ).collect()
    }
    for vid, w in want.items():
        assert got[vid]["cluster"] == w["cluster"]
        assert got[vid]["d2_ratio"] >= 0
    assert np.isfinite([r["d2_ratio"] for r in got.values()]).all()


def test_stateful_price_delta_tws(spark, tmp_path):
    """transformWithStateInPandas twin of the applyInPandasWithState
    delta: identical output on the same two snapshots. Requires the
    RocksDB state-store provider (conf restored after the run) AND
    protobuf — the new API's Python state server speaks protobuf to
    the JVM; this container doesn't ship it (no installs allowed), so
    the test skips where the import fails, exactly like the media
    decode stubs."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas state server needs protobuf; "
        "not shipped in this container",
    )
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir, exist_ok=True)

    key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        t0 = dt.datetime(2024, 1, 1, 10)
        t1 = dt.datetime(2024, 1, 1, 11)
        _write_dump(spark, input_dir, "d0", t0, [(1, 100, 100, 1)])
        _write_dump(spark, input_dir, "d1", t1, [(2, 100, 150, 1)])

        stream = sp.price_delta_tws(sp.read_auction_stream(spark, input_dir))
        q = sp.run_to_parquet(stream, out_dir, ckpt, mode="append")
        q.awaitTermination()

        rows = sorted(
            spark.read.parquet(out_dir).collect(), key=lambda r: r["dump_ts"]
        )
        assert [r["avg_buyout_per"] for r in rows] == [100.0, 150.0]
        assert rows[0]["prev_avg"] is None and rows[0]["delta"] is None
        assert rows[1]["prev_avg"] == 100.0 and rows[1]["delta"] == 50.0
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)


def test_stream_static_enrich(spark, tmp_path):
    """Stream-static dimension join: every streamed auction row picks
    up its item name from the static dim; unmatched items survive as
    nulls (left join, no dropped facts)."""
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir, exist_ok=True)

    t0 = dt.datetime(2024, 1, 1, 10)
    _write_dump(spark, input_dir, "d0", t0, [(1, 100, 500, 1), (2, 999, 700, 1)])
    items = spark.createDataFrame(
        [(100, "iron ore")], "item long, item_name string"
    )

    enriched = sp.enrich_stream_with_items(
        sp.read_auction_stream(spark, input_dir), items
    )
    q = sp.run_to_parquet(enriched, out_dir, ckpt)
    q.awaitTermination()

    rows = {r["auc"]: r["item_name"] for r in spark.read.parquet(out_dir).collect()}
    assert rows == {1: "iron ore", 2: None}


def test_attribution_chained_stateful(spark, tmp_path):
    """Interval join + windowed aggregate chained in ONE streaming
    query (multi-stateful pipeline): purchases inside the attribution
    window of a click count toward their hour bucket; purchases with
    no qualifying click (too early / other user) do not."""
    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    t0 = dt.datetime(2024, 1, 1, 10, 0)
    far = t0 + dt.timedelta(days=2)
    # the GLOBAL watermark is min over both inputs, so BOTH streams
    # need a far-future row for the closed buckets to flush (append
    # mode emits a bucket only once the watermark passes its end)
    clicks = spark.createDataFrame(
        [(1, t0), (2, t0 + dt.timedelta(hours=3)), (8, far)],
        "user_id long, ts timestamp",
    )
    buys = spark.createDataFrame(
        [
            # u1 buys 30 min after the click → attributed to 10:00 bucket
            (1, t0 + dt.timedelta(minutes=30), 100.0),
            # u1 buys 2h later (outside 1h window) → NOT attributed
            (1, t0 + dt.timedelta(hours=2), 40.0),
            # u2 buys before any click → NOT attributed
            (2, t0 + dt.timedelta(hours=1), 70.0),
            # u2 buys 10 min after the 13:00 click → attributed to 13:00
            (2, t0 + dt.timedelta(hours=3, minutes=10), 30.0),
            # watermark-advancing purchase with no matching click (u9):
            # never attributed, its bucket never materializes
            (9, far, 1.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    clicks.coalesce(1).write.mode("append").parquet(clicks_dir)
    buys.coalesce(1).write.mode("append").parquet(buys_dir)

    c_stream = spark.readStream.schema("user_id long, ts timestamp").parquet(
        clicks_dir
    )
    b_stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(buys_dir)
    agg = sp.attribution_stream(c_stream, b_stream, within_hours=1)
    q = sp.run_to_parquet(agg, out_dir, ckpt)
    q.awaitTermination()

    got = {
        r["bucket_ts"]: (r["n_attributed"], r["attributed_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {
        t0: (1, 100.0),
        t0 + dt.timedelta(hours=3): (1, 30.0),
    }


def test_rocksdb_state_store_backend(spark, tmp_path):
    """The tumbling aggregation runs unchanged on the RocksDB state
    store (the 100 TB state backend): same results as the default
    provider, and the checkpoint actually contains RocksDB artifacts
    (snapshot zips / changelogs), proving the provider engaged."""
    import os

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    _write_dump(
        spark, input_dir, "d0", t0, [(1, 100, 500, 1), (2, 100, 900, 1)]
    )
    _write_dump(
        spark, input_dir, "d1", t0 + dt.timedelta(hours=3), [(3, 200, 700, 2)]
    )

    sp.use_rocksdb_state(spark)
    try:
        stream = sp.read_auction_stream(spark, input_dir)
        agg = sp.hourly_price_stream(stream, late="2 hours")
        q = sp.run_to_parquet(agg, out_dir, ckpt, mode="append")
        q.awaitTermination()
    finally:
        sp.use_default_state(spark)

    rows = {
        (r["item"], r["bucket_ts"]): r for r in spark.read.parquet(out_dir).collect()
    }
    assert (100, t0) in rows and rows[(100, t0)]["volume"] == 2

    state_files = [
        f
        for root, _, fs in os.walk(os.path.join(ckpt, "state"))
        for f in fs
    ]
    assert any(
        f.endswith(".zip") or f.endswith(".changelog") for f in state_files
    ), state_files


def test_listing_expiry_timeout_emission(spark, tmp_path):
    """T16: output is produced by STATE TIMEOUT, not by data. Auction 1
    is re-listed and stays live (no emission); auction 2 disappears and
    expires once the watermark passes last_seen + ttl; the expiry row
    carries its true (first_seen, last_seen) span."""
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    t0 = dt.datetime(2024, 1, 1, 10, 0)
    t1 = t0 + dt.timedelta(hours=1)
    _write_dump(spark, input_dir, "d0", t0, [(1, 100, 500, 1), (2, 200, 900, 1)])
    # auction 1 re-listed at t1; auction 2 gone
    _write_dump(spark, input_dir, "d1", t1, [(1, 100, 500, 1)])

    stream = sp.listing_expiry_stream(
        sp.read_auction_stream(spark, input_dir, max_files=1), ttl_hours=2
    )
    q = sp.run_to_parquet(stream, out_dir, ckpt)
    q.awaitTermination()

    def read_out():
        try:
            return {r["auc"]: r for r in spark.read.parquet(out_dir).collect()}
        except Exception:  # noqa: BLE001 — no output files yet
            return {}

    # watermark is only at t1: nothing has expired yet
    assert read_out() == {}

    # a much later dump pushes the watermark past t0 + 2h → auction 2
    # times out; auctions 1 (last seen t1, ttl to t1+2h < watermark)
    # also expires unless re-listed — list it again to keep it live
    t2 = t0 + dt.timedelta(hours=6)
    _write_dump(spark, input_dir, "d2", t2, [(1, 100, 500, 1), (9, 300, 100, 1)])
    q = sp.run_to_parquet(stream, out_dir, ckpt)
    q.awaitTermination()

    out = read_out()
    assert 2 in out, "vanished auction must expire via timeout"
    assert out[2]["first_seen"] == t0 and out[2]["last_seen"] == t0
    assert out[2]["item"] == 200 and out[2]["buyout"] == 900
    # auction 1 had fresh data in the same batch (re-listed at t2):
    # its timeout moved to t2+ttl, so it must NOT appear; auction 9 is
    # newly seen and live
    assert 1 not in out and 9 not in out


def test_streaming_hot_items(spark, tmp_path):
    """hot_items_stream: the MG state folds across micro-batches, the
    flooding item is flagged with an estimate inside the documented
    undercount bound, and cold items stay silent."""
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir, exist_ok=True)

    t0 = dt.datetime(2024, 1, 1, 10)
    # batch 1: item 7 listed 30x, items 100..119 once each (50 rows)
    rows0 = [(i, 7, 100, 1) for i in range(30)]
    rows0 += [(100 + i, 100 + i, 100, 1) for i in range(20)]
    _write_dump(spark, input_dir, "d0", t0, rows0)

    stream = sp.hot_items_stream(
        sp.read_auction_stream(spark, input_dir), cap=8, min_share=0.25
    )
    q = sp.run_to_parquet(stream, out_dir, ckpt, mode="append")
    q.awaitTermination()

    # batch 2 (resume from checkpoint): item 7 floods again
    t1 = dt.datetime(2024, 1, 1, 11)
    rows1 = [(1000 + i, 7, 100, 1) for i in range(25)]
    rows1 += [(2000 + i, 300 + i, 100, 1) for i in range(25)]
    _write_dump(spark, input_dir, "d1", t1, rows1)
    q2 = sp.run_to_parquet(stream, out_dir, ckpt, mode="append")
    q2.awaitTermination()

    out = spark.read.parquet(out_dir).collect()
    flagged = sorted({r["item"] for r in out})
    assert flagged == [7]  # only the flooding item, both rounds
    final = max(
        (r for r in out if r["item"] == 7), key=lambda r: r["n_seen"]
    )
    # true count 55 of 100 rows; MG undercounts by at most N/(cap+1)
    assert final["n_seen"] == 100
    assert final["est"] <= 55
    assert final["est"] >= 55 - final["max_undercount"]
    assert final["est"] >= 0.25 * final["n_seen"]


def test_bitmap_distinct_stream_incremental_equals_oneshot(spark, tmp_path):
    """Streaming bitmap gold (r8): the foreachBatch OR-fold over
    micro-batches equals the one-shot COUNT(DISTINCT) after every
    drain, across a checkpoint resume, and a replayed epoch (same
    batch_id) cannot double-fold."""
    import json

    input_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir, exist_ok=True)

    t0 = dt.datetime(2024, 1, 1, 10)
    t1 = dt.datetime(2024, 1, 1, 11)
    t2 = dt.datetime(2024, 1, 1, 12)
    # maxFilesPerTrigger=1 → each dump is its own micro-batch/epoch
    _write_dump(spark, input_dir, "d0", t0, [(1, 100, 10, 1), (2, 101, 10, 1)])
    _write_dump(spark, input_dir, "d1", t1, [(3, 101, 10, 1), (4, 102, 10, 1)])

    def oneshot():
        return (
            spark.read.schema(AUCTION).parquet(input_dir)
            .select("region", "realm_slug", "item").distinct().count()
        )

    q = sp.bitmap_distinct_stream(spark, input_dir, state_dir, ckpt)
    q.awaitTermination()
    got = {
        (r["region"], r["realm_slug"]): r["distinct_exact"]
        for r in sp.read_bitmap_distinct_state(spark, state_dir).collect()
    }
    assert list(got) == [("eu", "r1")]
    assert got[("eu", "r1")] == oneshot() == 3

    # resume: only the new file folds; incremental == one-shot again
    _write_dump(spark, input_dir, "d2", t2, [(5, 500, 10, 1), (6, 100, 10, 1)])
    q2 = sp.bitmap_distinct_stream(spark, input_dir, state_dir, ckpt)
    q2.awaitTermination()
    got2 = {
        (r["region"], r["realm_slug"]): r["distinct_exact"]
        for r in sp.read_bitmap_distinct_state(spark, state_dir).collect()
    }
    assert got2[("eu", "r1")] == oneshot() == 4

    # replayed epoch: re-delivering an ALREADY-FOLDED batch_id is a
    # no-op (the at-least-once crash window foreachBatch must survive)
    # epoch marker commits atomically INSIDE the swapped state dir
    with open(os.path.join(state_dir, "bitmaps", "_epoch")) as fh:
        last = json.load(fh)["batch_id"]
    replay = _dump(spark, t1, [(3, 101, 10, 1), (4, 102, 10, 1)])
    # simulate the replay by calling the sink path directly: fold is
    # gated on batch_id <= last, so state must not change
    before = got2[("eu", "r1")]
    q3 = sp.bitmap_distinct_stream(spark, input_dir, state_dir, str(tmp_path / "ckpt2"))
    q3.awaitTermination()  # fresh checkpoint replays ALL files as epochs 0..n
    got3 = {
        (r["region"], r["realm_slug"]): r["distinct_exact"]
        for r in sp.read_bitmap_distinct_state(spark, state_dir).collect()
    }
    # epochs 0..2 of the fresh checkpoint are <= the stored epoch (2),
    # so nothing re-folds; counts unchanged (idempotent under replay —
    # OR-folds would also make a re-fold harmless, but the gate is the
    # contract)
    assert got3[("eu", "r1")] == before == 4
    assert replay.count() == 2  # (strategy sanity, keeps flake-free)


def test_price_hist_stream_incremental_equals_oneshot(spark, tmp_path):
    """Streaming log-histogram gold (r8): per-micro-batch count folds
    equal one-shot bucketing of all input, and the median read off the
    streamed state is within the gold's e^w - 1 relative-error bound
    of the exact median."""
    import math

    from server_spark.plans.maintenance import _HIST_W, price_histograms

    input_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir, exist_ok=True)

    t0 = dt.datetime(2024, 1, 1, 10)
    t1 = dt.datetime(2024, 1, 1, 11)
    _write_dump(spark, input_dir, "d0", t0,
                [(1, 100, 100, 1), (2, 100, 300, 1), (3, 100, 0, 1)])
    _write_dump(spark, input_dir, "d1", t1,
                [(4, 100, 500, 1), (5, 100, 900, 1), (6, 100, 1100, 1)])

    q = sp.price_hist_stream(spark, input_dir, state_dir, ckpt)
    q.awaitTermination()

    # bucket counts: streamed fold == one-shot bucketing of everything
    oneshot = price_histograms(
        spark.read.schema(AUCTION).parquet(input_dir)
        .filter("buyout > 0"),
        ["region", "realm_slug", "item"],
        (F.col("buyout") / F.col("quantity")),
    )
    want = {
        tuple(r)[:4]: r["cnt"]
        for r in oneshot.collect()
    }
    got = {
        tuple(r)[:4]: r["cnt"]
        for r in spark.read.parquet(os.path.join(state_dir, "hist")).collect()
    }
    assert got == want

    # median estimate within the documented relative-error bound
    est = {
        r["item"]: r["p50_est"]
        for r in sp.read_price_median_state(spark, state_dir).collect()
    }
    exact_median = 500.0  # values 100,300,500,900,1100 (0 excluded)
    assert abs(est[100] - exact_median) / exact_median <= math.exp(_HIST_W) - 1


def test_stream_stream_lifetime_left_outer(spark, tmp_path):
    """Left-outer lifetime join: a sold auction emits its removal row;
    an UNSOLD one emits with NULL removal columns — but only after the
    watermark has provably passed its join interval (a later dump
    advances it), never speculatively."""
    posts_dir = str(tmp_path / "posts")
    rm_dir = str(tmp_path / "rm")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    t0 = dt.datetime(2024, 1, 1, 10, 0)
    _write_dump(
        spark, posts_dir, "d0", t0,
        [(1, 100, 500, 1), (2, 100, 900, 1)],
    )
    spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=30))],  # auc 1 sold; auc 2 never
        "auc long, removed_ts timestamp",
    ).coalesce(1).write.mode("append").parquet(rm_dir)

    def run():
        posts = sp.read_auction_stream(spark, posts_dir)
        rm_stream = spark.readStream.schema(
            "auc long, removed_ts timestamp"
        ).parquet(rm_dir)
        q = sp.run_to_parquet(
            sp.auction_lifetime_stream(
                posts, rm_stream, within_hours=2, join_type="leftOuter"
            ),
            out_dir, ckpt,
        )
        q.awaitTermination()
        try:
            return {
                r["auc"]: r for r in spark.read.parquet(out_dir).collect()
            }
        except Exception:  # noqa: BLE001 — no output yet
            return {}

    # run 1: the match emits; the unsold NULL row CANNOT yet (global
    # watermark hasn't passed auc 2's interval)
    rows = run()
    assert set(rows) == {1}
    assert rows[1]["seconds_listed"] == 1800

    # advance BOTH watermarks far past t0+2h → auc 2's state is
    # provably complete → the NULL row emits on resume
    t_late = t0 + dt.timedelta(hours=10)
    _write_dump(spark, posts_dir, "d1", t_late, [(9, 300, 100, 1)])
    spark.createDataFrame(
        [(9, t_late + dt.timedelta(minutes=1))],
        "auc long, removed_ts timestamp",
    ).coalesce(1).write.mode("append").parquet(rm_dir)

    rows = run()
    assert 2 in rows, "unsold auction never emitted its NULL row"
    assert rows[2]["removed_ts"] is None
    assert rows[2]["seconds_listed"] is None
    assert rows[1]["seconds_listed"] == 1800  # not re-emitted/changed


def test_cusum_changepoint_stream(spark, tmp_path):
    """Streaming CUSUM: a level shift after calibration fires exactly
    one 'up' alert (then re-arms); a flat series never alerts; state
    survives a checkpoint resume."""
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir, exist_ok=True)

    t0 = dt.datetime(2024, 1, 1, 0, 0)

    def snap(i, price_100, price_200):
        # item 100: shifts later; item 200: flat control
        _write_dump(
            spark, input_dir, f"d{i}", t0 + dt.timedelta(hours=i),
            [(i * 10 + 1, 100, price_100, 1), (i * 10 + 2, 200, price_200, 1)],
        )

    # calibration: 8 snapshots with mild wiggle (sd > 0)
    for i, p in enumerate([100, 102, 98, 101, 99, 100, 103, 97]):
        snap(i, p, 500)

    def run():
        stream = sp.cusum_changepoint_stream(
            sp.read_auction_stream(spark, input_dir)
        )
        q = sp.run_to_parquet(stream, out_dir, ckpt, mode="append")
        q.awaitTermination()
        try:
            return spark.read.parquet(out_dir).collect()
        except Exception:  # noqa: BLE001 — no alerts yet
            return []

    assert run() == []  # calibration only — nothing may fire

    # sustained +50% level shift on item 100; control stays flat
    for i in range(8, 14):
        snap(i, 150, 500)
    rows = run()
    ups = [r for r in rows if r["item"] == 100]
    assert len(ups) == 1, f"expected exactly one alert, got {rows}"
    assert ups[0]["direction"] == "up"
    assert ups[0]["n_seen"] > 8
    assert not [r for r in rows if r["item"] == 200], "flat series alerted"

    # resume: a renewed shift after the reset fires again (re-armed)
    for i in range(14, 20):
        snap(i, 40, 500)
    rows = run()
    downs = [
        r for r in rows if r["item"] == 100 and r["direction"] == "down"
    ]
    assert len(downs) == 1, f"expected one 'down' alert after resume: {rows}"


def test_cusum_dispersion_frozen_on_long_quiet_stream(spark, tmp_path):
    """r11 review finding: sd was computed as sqrt(m2/(n-1)) with the
    calibration-frozen m2 but the ever-growing snapshot count n, so on
    a long stable stream sd decayed toward 0, z inflated, and the
    monitor fired on sub-threshold wiggle. Dispersion must stay at its
    calibration value: hundreds of quiet snapshots (a 0.5-sigma ripple,
    below the k=0.5 design threshold) must produce ZERO alerts."""
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir, exist_ok=True)

    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = []
    # calibration: sd ~ 2 around mean 100
    cal = [100, 102, 98, 101, 99, 100, 103, 97]
    for i, pr in enumerate(cal):
        rows.append((i + 1, 100, pr, 1, t0 + dt.timedelta(hours=i)))
    # 300 post-warmup snapshots riding +1 above baseline (~0.5 sigma,
    # below the k*sigma design threshold: a correct tabular CUSUM
    # accumulates z - k ~= 0 and never crosses h)
    for i in range(8, 308):
        rows.append((i + 1, 100, 101, 1, t0 + dt.timedelta(hours=i)))
    data = [
        (auc, item, "o", "r1", 9, buyout, qty, "LONG", "eu", "r1", ts)
        for auc, item, buyout, qty, ts in rows
    ]
    spark.createDataFrame(data, AUCTION).coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)

    stream = sp.cusum_changepoint_stream(
        sp.read_auction_stream(spark, input_dir)
    )
    q = sp.run_to_parquet(stream, out_dir, ckpt, mode="append")
    q.awaitTermination()
    try:
        alerts = spark.read.parquet(out_dir).collect()
    except Exception:  # noqa: BLE001 — no alerts: no files
        alerts = []
    assert alerts == [], f"quiet stream alerted: {alerts}"


def test_price_moments_stream_incremental_equals_oneshot(spark, tmp_path):
    """Streaming moments gold: the epoch-gated fold of (n, Σx, Σx²)
    equals a one-shot aggregate EXACTLY (decimal sums) after every
    drain and across a checkpoint resume; the read-back mean/std
    match python on the raw prices."""
    import math

    input_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir, exist_ok=True)

    t0 = dt.datetime(2024, 1, 1, 10)
    t1 = dt.datetime(2024, 1, 1, 11)
    # (auc, item, buyout, quantity): unit prices 10, 20 (zero excluded)
    _write_dump(spark, input_dir, "d0", t0,
                [(1, 100, 10, 1), (2, 101, 40, 2), (3, 102, 0, 1)])

    q = sp.price_moments_stream(spark, input_dir, state_dir, ckpt)
    q.awaitTermination()

    def read():
        return {
            (r["region"], r["realm_slug"]):
                (r["n"], r["mean_price"], r["std_price"])
            for r in sp.read_price_moments_state(spark, state_dir).collect()
        }

    n, mean, std = read()[("eu", "r1")]
    assert (n, mean) == (2, 15.0)
    assert abs(std - 5.0) < 1e-9

    # resume: fold only the new file; stats now over 10, 20, 60
    _write_dump(spark, input_dir, "d1", t1, [(4, 103, 60, 1)])
    q2 = sp.price_moments_stream(spark, input_dir, state_dir, ckpt)
    q2.awaitTermination()
    prices = [10.0, 20.0, 60.0]
    m = sum(prices) / 3
    v = sum((p - m) ** 2 for p in prices) / 3
    n, mean, std = read()[("eu", "r1")]
    assert n == 3
    # tolerance = the DECIMAL(38,6) storage quantum propagated through
    # the read-back algebra, not float noise
    assert abs(mean - m) < 1e-6
    assert abs(std - math.sqrt(v)) < 1e-6

    # fresh checkpoint replays all epochs against standing state: the
    # epoch gate must make that a no-op, not a double-fold
    q3 = sp.price_moments_stream(
        spark, input_dir, state_dir, str(tmp_path / "ckpt2")
    )
    q3.awaitTermination()
    assert read()[("eu", "r1")][0] == 3


def test_colocated_fold_streams_share_state_dir(spark, tmp_path):
    """r11 review finding: the epoch gate used one state_dir-level
    sidecar, so a SECOND fold stream pointed at the same state_dir
    (the layout the read_* helpers are designed around) saw the first
    stream's epoch and silently skipped every fold. The marker now
    rides inside each fold's own subdir — both streams must fold."""
    input_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir, exist_ok=True)

    t0 = dt.datetime(2024, 1, 1, 10)
    t1 = dt.datetime(2024, 1, 1, 11)
    _write_dump(spark, input_dir, "d0", t0,
                [(1, 100, 100, 1), (2, 101, 300, 1)])
    _write_dump(spark, input_dir, "d1", t1,
                [(3, 101, 500, 1), (4, 102, 900, 1)])

    q = sp.bitmap_distinct_stream(
        spark, input_dir, state_dir, str(tmp_path / "ck_bm"))
    q.awaitTermination()
    q2 = sp.price_hist_stream(
        spark, input_dir, state_dir, str(tmp_path / "ck_hist"))
    q2.awaitTermination()

    got_bm = {
        (r["region"], r["realm_slug"]): r["distinct_exact"]
        for r in sp.read_bitmap_distinct_state(spark, state_dir).collect()
    }
    assert got_bm[("eu", "r1")] == 3  # items 100,101,102
    # the second stream MUST have created and folded its own state
    assert os.path.exists(os.path.join(state_dir, "hist"))
    est = sp.read_price_median_state(spark, state_dir).collect()
    assert len(est) > 0
    # and each fold carries its own epoch marker
    assert os.path.exists(os.path.join(state_dir, "bitmaps", "_epoch"))
    assert os.path.exists(os.path.join(state_dir, "hist", "_epoch"))



def test_legacy_epoch_sidecar_gates_replay_after_upgrade(spark, tmp_path):
    """r12 advisor finding: state folded under the pre-r11 format
    (ONE shared state_dir/_epoch sidecar, no in-dir marker) must not
    read as epoch -1 after the upgrade — foreachBatch is at-least-once,
    so a checkpoint replay of the last committed batch would
    double-apply that fold exactly once. _epoch_of falls back to the
    legacy sidecar (read-only: the file was SHARED across co-located
    fold streams, so it is never deleted or migrated here) and the
    next genuine fold writes the in-dir marker atomically."""
    import json

    input_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir, exist_ok=True)

    t0 = dt.datetime(2024, 1, 1, 10)
    t1 = dt.datetime(2024, 1, 1, 11)
    _write_dump(spark, input_dir, "d0", t0,
                [(1, 100, 100, 1), (2, 101, 300, 1)])

    q = sp.price_hist_stream(
        spark, input_dir, state_dir, str(tmp_path / "ck0"))
    q.awaitTermination()
    hist_dir = os.path.join(state_dir, "hist")

    def total():
        return sum(r["cnt"] for r in spark.read.parquet(hist_dir).collect())

    base = total()
    assert base == 2

    # downgrade the on-disk state to the pre-r11 format
    os.rename(os.path.join(hist_dir, "_epoch"),
              os.path.join(state_dir, "_epoch"))

    # a fresh checkpoint replays d0 as epoch 0 — the legacy sidecar
    # (epoch 0) must gate it; without the fallback this double-folds
    q2 = sp.price_hist_stream(
        spark, input_dir, state_dir, str(tmp_path / "ck1"))
    q2.awaitTermination()
    assert total() == base, "replayed epoch double-applied after upgrade"

    # a genuinely new dump folds once and writes the in-dir marker
    _write_dump(spark, input_dir, "d1", t1,
                [(3, 101, 500, 1), (4, 102, 900, 1)])
    q3 = sp.price_hist_stream(
        spark, input_dir, state_dir, str(tmp_path / "ck2"))
    q3.awaitTermination()
    assert total() == base + 2
    with open(os.path.join(hist_dir, "_epoch")) as fh:
        assert json.load(fh)["batch_id"] == 1
    # the shared legacy sidecar is left in place for sibling streams
    assert os.path.exists(os.path.join(state_dir, "_epoch"))

    # and a SIBLING fold stream over the same state_dir (its own
    # subdir has real pre-upgrade-shaped absence: no state at all)
    # must treat the leftover shared sidecar as not-its-gate and fold
    q4 = sp.bitmap_distinct_stream(
        spark, input_dir, state_dir, str(tmp_path / "ck_bm"))
    q4.awaitTermination()
    got = {
        (r["region"], r["realm_slug"]): r["distinct_exact"]
        for r in sp.read_bitmap_distinct_state(spark, state_dir).collect()
    }
    assert got[("eu", "r1")] == 3

def test_tws_env_block_is_pinned():
    """r11 (VERDICT r10 item 7): the transformWithStateInPandas twin
    is env-blocked (its Python state server speaks protobuf to the
    JVM; this container ships none and installs are not allowed).
    This test PINS that block: the day the environment gains
    protobuf it FAILS, demanding test_stateful_price_delta_tws be
    un-skipped — the block can never silently rot into a forgotten
    coverage hole. Until then it asserts the twin's code path stays
    importable and plan-buildable up to the protobuf boundary."""
    try:
        import google.protobuf  # noqa: F401

        blocked = False
    except ImportError:
        blocked = True
    if not blocked:
        import pytest

        pytest.fail(
            "google.protobuf is now importable: remove this pin and "
            "un-skip test_stateful_price_delta_tws (VERDICT r10 item 7)"
        )
    # the twin exists, is documented, and its StatefulProcessor class
    # builds — only the runtime state server needs protobuf
    assert callable(sp.price_delta_tws)
    assert "protobuf" in (sp.price_delta_tws.__doc__ or "")
