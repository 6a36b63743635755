"""Concurrent-writer isolation for the medallion commit log (r11,
VERDICT r10 item 2).

The hand-rolled manifest log was single-writer-tested through r10;
these tests interleave two real writers (threads sharing the Spark
session, each driving full ingest/compaction jobs) and assert the
Delta-log-analog guarantees: no lost batches, no duplicate dump keys
or batch_ids, and manifest-pinned readers never see a torn snapshot.
Plus unit coverage of the lock itself (mutual exclusion, stale-lock
break, timeout, release-on-exception).
"""

from __future__ import annotations

import datetime as dt
import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from server_spark.plans import medallion as med


def _dump(spark, ts, aucs, realm="r1"):
    return spark.createDataFrame(
        [("eu", realm, ts, a, 100, 500, 1) for a in aucs],
        "region string, realm_slug string, dump_ts timestamp, "
        "auc long, item long, buyout long, quantity long",
    )


def _full_dump(spark, ts, aucs, realm="r1"):
    """Full collapse-key schema (owner/time_left) — what the silver
    builder's COLLAPSE_KEYS require."""
    return spark.createDataFrame(
        [
            ("eu", realm, ts, a, 100, f"own{a % 2}", 500, 1, "LONG")
            for a in aucs
        ],
        "region string, realm_slug string, dump_ts timestamp, "
        "auc long, item long, owner string, buyout long, "
        "quantity long, time_left string",
    )


def test_lock_mutual_exclusion_and_release(tmp_path):
    root = str(tmp_path / "lake")
    order: list[str] = []

    def hold(tag, dwell):
        with med.commit_lock(root, timeout=30.0):
            order.append(f"{tag}-in")
            time.sleep(dwell)
            order.append(f"{tag}-out")

    t1 = threading.Thread(target=hold, args=("a", 0.3))
    t2 = threading.Thread(target=hold, args=("b", 0.3))
    t1.start()
    time.sleep(0.05)  # let one writer claim first
    t2.start()
    t1.join()
    t2.join()
    # critical sections never interleave: every -in is followed by
    # the SAME tag's -out
    assert order[0].split("-")[0] == order[1].split("-")[0]
    assert order[2].split("-")[0] == order[3].split("-")[0]
    # lock released at the end
    assert not os.path.exists(os.path.join(root, "manifest", ".commit.lock"))


def test_lock_releases_on_exception_and_times_out(tmp_path):
    root = str(tmp_path / "lake")
    with pytest.raises(RuntimeError):
        with med.commit_lock(root):
            raise RuntimeError("writer died cleanly")
    assert not os.path.exists(os.path.join(root, "manifest", ".commit.lock"))

    # a held lock times a second claimant out...
    with med.commit_lock(root):
        t0 = time.monotonic()
        with pytest.raises(TimeoutError):
            with med.commit_lock(root, timeout=0.3, stale_after=600.0):
                pass
        assert time.monotonic() - t0 >= 0.3


def test_stale_lock_broken(tmp_path):
    root = str(tmp_path / "lake")
    lockfile = os.path.join(root, "manifest", ".commit.lock")
    os.makedirs(os.path.dirname(lockfile))
    with open(lockfile, "w") as fh:
        fh.write("{}")
    # age the lockfile past stale_after: a dead holder must not wedge
    # the table forever
    old = time.time() - 1000
    os.utime(lockfile, (old, old))
    with med.commit_lock(root, timeout=5.0, stale_after=600.0):
        pass
    assert not os.path.exists(lockfile)


def test_concurrent_ingest_no_lost_or_duplicate_commits(spark, tmp_path):
    """Two writers race overlapping dump sets. Required outcome: every
    dump key lands EXACTLY once in bronze and the manifest, batch_ids
    are unique per commit, and no batch is lost. Without the commit
    lock both writers read max(batch_id) concurrently, mint the same
    id, and both pass the key gate — duplicate rows + torn history."""
    paths = med.MedallionPaths(str(tmp_path / "lake"))
    t0 = dt.datetime(2024, 1, 1, 10)
    t1 = t0 + dt.timedelta(hours=1)
    t2 = t0 + dt.timedelta(hours=2)
    # writer A: dumps at t0+t1; writer B: dumps at t1+t2 (t1 overlaps)
    raw_a = _dump(spark, t0, [1, 2]).unionAll(_dump(spark, t1, [3, 4]))
    raw_b = _dump(spark, t1, [3, 4]).unionAll(_dump(spark, t2, [5, 6, 7]))

    results: dict[str, int] = {}
    errs: list[BaseException] = []

    def run(tag, raw):
        try:
            results[tag] = med.ingest_bronze_incremental(spark, raw, paths)
        except BaseException as e:  # surfaced below
            errs.append(e)

    ta = threading.Thread(target=run, args=("a", raw_a))
    tb = threading.Thread(target=run, args=("b", raw_b))
    ta.start()
    tb.start()
    ta.join()
    tb.join()
    assert not errs, errs

    # no lost batches: all 3 dump keys committed across the two writers
    manifest = med.load_manifest(spark, paths)
    keys = manifest.select("dump_ts").collect()
    assert sorted(r[0] for r in keys) == [t0, t1, t2]
    # no duplicate keys (t1 ingested by exactly one writer)
    assert manifest.count() == 3
    assert results["a"] + results["b"] == 3
    # batch_ids unique per commit and contiguous from 1
    ids = [r[0] for r in manifest.select("batch_id").distinct().collect()]
    assert sorted(ids) == list(range(1, len(ids) + 1))
    # bronze rows exactly once per key: 2 + 2 + 3
    bronze = spark.read.parquet(paths.bronze)
    assert bronze.count() == 7
    assert bronze.select("auc", "dump_ts").distinct().count() == 7


def test_concurrent_ingest_and_compaction(spark, tmp_path):
    """An ingest racing a locked compaction of the same table: the
    compaction must not delete-list files appearing mid-walk, and the
    post-race table must hold every committed row exactly once."""
    paths = med.MedallionPaths(str(tmp_path / "lake"))
    t0 = dt.datetime(2024, 1, 1, 10)
    # seed: 3 dumps on one partition, written as many small files
    for i in range(3):
        assert med.ingest_bronze_incremental(
            spark, _dump(spark, t0 + dt.timedelta(minutes=i), [1, 2, 3]),
            paths,
        ) == 1

    errs: list[BaseException] = []
    stats: dict = {}

    def ingest_more():
        try:
            for i in range(3, 6):
                med.ingest_bronze_incremental(
                    spark,
                    _dump(spark, t0 + dt.timedelta(minutes=i), [1, 2, 3]),
                    paths,
                )
        except BaseException as e:
            errs.append(e)

    def compact():
        try:
            stats.update(
                med.compact_small_files(
                    spark, paths.bronze, lock_root=paths.root
                )
            )
        except BaseException as e:
            errs.append(e)

    ti = threading.Thread(target=ingest_more)
    tc = threading.Thread(target=compact)
    ti.start()
    tc.start()
    ti.join()
    tc.join()
    assert not errs, errs
    # every committed row present exactly once after the race
    bronze = spark.read.parquet(paths.bronze)
    assert bronze.count() == 18  # 6 dumps x 3 rows
    assert bronze.select("auc", "dump_ts").distinct().count() == 18
    assert med.load_manifest(spark, paths).count() == 6
    assert "compacted_partitions" in stats


def test_asof_reader_never_sees_torn_snapshot(spark, tmp_path):
    """A reader pinned to manifest version N must observe EXACTLY
    version N's rows while a writer appends later batches — bronze is
    append-only and the asof semi-join filters in-flight keys, so no
    read ever returns a partial batch."""
    paths = med.MedallionPaths(str(tmp_path / "lake"))
    t0 = dt.datetime(2024, 1, 1, 10)
    assert med.ingest_bronze_incremental(
        spark, _dump(spark, t0, [1, 2, 3, 4]), paths
    ) == 1
    v1 = med.manifest_versions(spark, paths)[-1]
    v1_rows = med.read_bronze_asof(spark, paths, v1).count()
    assert v1_rows == 4

    stop = threading.Event()
    torn: list[int] = []

    def reader():
        while not stop.is_set():
            n = med.read_bronze_asof(spark, paths, v1).count()
            if n != v1_rows:
                torn.append(n)

    tr = threading.Thread(target=reader)
    tr.start()
    try:
        for i in range(1, 4):
            med.ingest_bronze_incremental(
                spark,
                _dump(spark, t0 + dt.timedelta(hours=i), list(range(50))),
                paths,
            )
    finally:
        stop.set()
        tr.join()
    assert torn == [], f"asof reader observed torn counts: {torn}"
    # unpinned latest-version read sees everything
    v_last = med.manifest_versions(spark, paths)[-1]
    assert med.read_bronze_asof(spark, paths, v_last).count() == 4 + 3 * 50


def test_concurrent_ingest_and_incremental_refresh(spark, tmp_path):
    """VERDICT r10 item 2's third leg: an incremental silver refresh
    racing new ingests. Both take the commit lock, so the refresh
    sees a consistent manifest + bronze and never tears a silver
    partition; afterwards a final refresh catches anything the race
    ordered behind it and silver equals a from-scratch rebuild."""
    paths = med.MedallionPaths(str(tmp_path / "lake"))
    t0 = dt.datetime(2024, 1, 1, 10)
    assert med.ingest_bronze_incremental(
        spark, _full_dump(spark, t0, [1, 2, 3]), paths
    ) == 1

    errs: list[BaseException] = []

    def ingest_more():
        try:
            for i in range(1, 4):
                med.ingest_bronze_incremental(
                    spark,
                    _full_dump(
                        spark, t0 + dt.timedelta(hours=i), [1, 2, 3]
                    ),
                    paths,
                )
        except BaseException as e:
            errs.append(e)

    def refresh():
        try:
            for _ in range(3):
                med.build_silver_incremental(spark, paths, 0)
        except BaseException as e:
            errs.append(e)

    ti = threading.Thread(target=ingest_more)
    tr = threading.Thread(target=refresh)
    ti.start()
    tr.start()
    ti.join()
    tr.join()
    assert not errs, errs
    # catch-up refresh, then silver must equal a full rebuild
    med.build_silver_incremental(spark, paths, 0)
    silver = spark.read.parquet(paths.silver)
    bronze = spark.read.parquet(paths.bronze)
    assert bronze.count() == 12  # 4 dumps x 3 rows, each exactly once
    # collapse semantics: per dump, aucs 1+3 share the owner key and
    # fold into one mini-auction ([2] stands alone) → 2 rows per dump
    assert silver.count() == 8
    # ...but every auc appears exactly once across the collapse lists
    exploded = silver.select(
        "dump_ts", F.explode("auc_list").alias("auc")
    )
    assert exploded.count() == 12
    assert exploded.distinct().count() == 12


def test_stale_break_restores_fresh_claim_raced_in(tmp_path):
    """The stale-break TOCTOU guard: when the 'stale' lock turns out
    FRESH after the rename (a live writer claimed in the window),
    the breaker must put it back, and a token-checked release never
    unlinks someone else's claim."""
    root = str(tmp_path / "lake")
    lockfile = os.path.join(root, "manifest", ".commit.lock")
    os.makedirs(os.path.dirname(lockfile))
    # a FRESH foreign lock (mtime now): stale-break path must not
    # destroy it — claimant times out instead
    with open(lockfile, "w") as fh:
        fh.write('{"token": "someone-else"}')
    with pytest.raises(TimeoutError):
        with med.commit_lock(root, timeout=0.3, stale_after=600.0):
            pass
    assert os.path.exists(lockfile)
    with open(lockfile) as fh:
        assert "someone-else" in fh.read()
    # and release-time ownership check: a lock stolen mid-hold is NOT
    # unlinked by the original holder's exit
    os.unlink(lockfile)
    cm = med.commit_lock(root, timeout=5.0)
    cm.__enter__()
    with open(lockfile, "w") as fh:  # simulate theft
        fh.write('{"token": "thief"}')
    cm.__exit__(None, None, None)
    assert os.path.exists(lockfile), "holder must not unlink a stolen lock"


def test_live_long_holder_not_evicted_by_stale_break(tmp_path):
    """Heartbeat liveness (r11 review finding): a LIVE holder running
    longer than stale_after must keep its lock — the heartbeat thread
    refreshes the lockfile mtime, so a second writer sees a fresh
    lock and times out instead of breaking it and re-opening the
    duplicate-ingest race the lock exists to prevent."""
    root = str(tmp_path / "lake")
    lockfile = os.path.join(root, "manifest", ".commit.lock")
    entered = threading.Event()
    release = threading.Event()
    stolen: list[bool] = []

    def long_holder():
        # stale_after far below the hold time: without a heartbeat
        # the second writer would break this lock mid-hold
        with med.commit_lock(root, timeout=5.0, stale_after=0.4):
            entered.set()
            release.wait(10.0)

    t = threading.Thread(target=long_holder)
    t.start()
    assert entered.wait(5.0)
    time.sleep(1.2)  # 3x stale_after while the holder is alive
    # mtime must have been refreshed within the last stale_after
    assert time.time() - os.path.getmtime(lockfile) < 0.4
    # a competing writer must TIME OUT, not steal the live lock
    t0 = time.monotonic()
    try:
        with med.commit_lock(root, timeout=0.9, stale_after=0.4):
            stolen.append(True)
    except TimeoutError:
        pass
    assert not stolen, "live holder's lock was broken despite heartbeat"
    assert time.monotonic() - t0 >= 0.9
    release.set()
    t.join(5.0)
    assert not os.path.exists(lockfile)


def test_dead_holder_still_broken_with_heartbeat_semantics(tmp_path):
    """A holder whose PROCESS died stops heartbeating: its lockfile
    mtime ages normally and the stale break still reclaims the table
    (the heartbeat must not have replaced claim-time staleness with
    something unbreakable)."""
    root = str(tmp_path / "lake")
    lockfile = os.path.join(root, "manifest", ".commit.lock")
    os.makedirs(os.path.dirname(lockfile))
    with open(lockfile, "w") as fh:
        fh.write('{"token": "dead-holder"}')
    old = time.time() - 5.0
    os.utime(lockfile, (old, old))
    with med.commit_lock(root, timeout=5.0, stale_after=1.0):
        with open(lockfile) as fh:
            assert "dead-holder" not in fh.read()
    assert not os.path.exists(lockfile)
