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


def test_multiprocess_lock_no_lost_or_duplicate_increments(tmp_path):
    """VERDICT r11 item 4: the r11 race tests interleaved THREADS; the
    lock's claim primitive (O_CREAT|O_EXCL) is a cross-process
    contract, so exercise it across real processes. Four worker
    processes each run five gate→mutate→commit critical sections over
    a shared sequence file; exclusion holds iff the final log carries
    every value 1..20 exactly once (a lost update repeats a value, a
    torn read skips one)."""
    import subprocess
    import sys

    root = str(tmp_path / "lake")
    os.makedirs(root, exist_ok=True)
    seq = os.path.join(root, "seq")
    log = os.path.join(root, "log")
    with open(seq, "w") as fh:
        fh.write("0")

    worker = f"""
import os, sys, time
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from server_spark.plans.medallion import commit_lock
for _ in range(5):
    with commit_lock({root!r}, timeout=120.0):
        with open({seq!r}) as fh:
            v = int(fh.read()) + 1
        time.sleep(0.01)  # widen the lost-update window
        with open({log!r}, "a") as fh:
            fh.write(f"{{os.getpid()}} {{v}}\\n")
        with open({seq!r}, "w") as fh:
            fh.write(str(v))
"""
    procs = [
        subprocess.Popen([sys.executable, "-c", worker],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for _ in range(4)
    ]
    for p in procs:
        _, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()

    with open(log) as fh:
        values = [int(line.split()[1]) for line in fh]
    assert sorted(values) == list(range(1, 21)), (
        "lost/duplicated increment across processes: "
        f"{sorted(values)}"
    )
    pids = {line.split()[0] for line in open(log)}
    assert len(pids) == 4  # all four processes really ran the section


def test_nonatomic_rename_cannot_corrupt_version_history(tmp_path, monkeypatch):
    """VERDICT r11 item 4: the stale-break path assumes os.rename is
    atomic. Simulate a filesystem where it is NOT (copy + visible
    window + unlink-by-name of the source — the naive userspace
    fallback shape) and hammer a stale lock with competing breakers.

    Finding baked into this test: exclusion itself CAN break there —
    the delayed unlink-by-name deletes a LIVE claim that reappeared
    at the lockfile's path, letting a second contender in (observed:
    3 simultaneous holders). That is the documented lock boundary.
    What must survive anyway is the COMMIT invariant, and it does
    because the mint is a conditional-put (_claim_batch_id): every
    contender runs the claim protocol inside its (possibly broken)
    critical section, losers detect the collision and retry, and the
    committed version log ends with no duplicate and no lost id."""
    import shutil

    real_rename = os.rename

    def sloppy_rename(src, dst, *a, **kw):
        # only de-atomize the lock-break renames; everything else
        # keeps real semantics
        if ".breaking." not in str(dst):
            return real_rename(src, dst, *a, **kw)
        shutil.copy2(src, dst)   # copy first (target visible early)
        time.sleep(0.02)         # the non-atomic window
        os.unlink(src)           # by NAME — may hit a newer file

    monkeypatch.setattr(os, "rename", sloppy_rename)

    root = str(tmp_path / "lake")
    lockfile = os.path.join(root, "manifest", ".commit.lock")
    os.makedirs(os.path.dirname(lockfile), exist_ok=True)
    # a dead holder's stale claim (mtime in the past, no heartbeat)
    with open(lockfile, "w") as fh:
        fh.write('{"token": "dead-holder"}')
    old = time.time() - 3600
    os.utime(lockfile, (old, old))

    paths = med.MedallionPaths(root)
    log = os.path.join(root, "commit_log")
    committed: list[int] = []
    collisions = {"n": 0}
    guard = threading.Lock()

    def contend(i: int) -> None:
        done = False
        while not done:
            with med.commit_lock(root, timeout=60.0, stale_after=0.5):
                # the mint protocol: compute next id, conditional-put
                # claim, commit only on success — a broken critical
                # section surfaces as a failed claim, never as two
                # writers committing one version
                bid = med._max_claimed_id(paths) + 1
                time.sleep(0.03)  # widen the double-mint window
                if med._claim_batch_id(paths, bid):
                    with open(log, "a") as fh:
                        fh.write(f"{i} {bid}\n")
                    done = True
                else:
                    with guard:
                        collisions["n"] += 1

    threads = [threading.Thread(target=contend, args=(i,))
               for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    with open(log) as fh:
        rows = [line.split() for line in fh]
    with guard:
        committed = [int(b) for _, b in rows]
    # no lost commit: every contender landed exactly one version
    assert sorted(int(w) for w, _ in rows) == [0, 1, 2]
    # no duplicate version, ever — even if exclusion broke
    assert len(set(committed)) == 3, (
        f"duplicate batch_id committed: {committed} "
        f"(collisions detected: {collisions['n']})"
    )


def test_batch_id_claim_burns_ids_across_crashes(spark, tmp_path):
    """Conditional-put mint (r12): a claim file without a manifest
    append (crash between the two) BURNS that version — the next
    ingest must mint PAST it, never reuse it for a different dump
    set (an as-of reader pinned to the burned id must not watch its
    snapshot change meaning)."""
    t0 = dt.datetime(2024, 1, 1, 10)
    paths = med.MedallionPaths(str(tmp_path / "lake"))
    assert med.ingest_bronze_incremental(
        spark, _dump(spark, t0, [1, 2]), paths) == 1
    assert med.manifest_versions(spark, paths) == [1]

    # simulate a crashed writer: claim 2 exists, no manifest append
    assert med._claim_batch_id(paths, 2)
    t1 = t0 + dt.timedelta(hours=1)
    assert med.ingest_bronze_incremental(
        spark, _dump(spark, t1, [3]), paths) == 1
    assert med.manifest_versions(spark, paths) == [1, 3]  # 2 burned


def test_double_mint_raises_loudly_and_retry_completes(spark, tmp_path):
    """Conditional-put mint (r12): if the lock primitive failed to
    exclude and another writer claimed the id this ingest computed,
    the commit must ABORT with ConcurrentCommitError before touching
    the manifest (version history uncorrupted) — and a plain retry
    completes the interrupted commit without duplicating bronze rows
    (the orphan gate)."""
    t0 = dt.datetime(2024, 1, 1, 10)
    paths = med.MedallionPaths(str(tmp_path / "lake"))
    assert med.ingest_bronze_incremental(
        spark, _dump(spark, t0, [1, 2]), paths) == 1

    # adversarial interleaving: the "other writer" claims id 2 at the
    # exact moment this ingest computes it — emulate by making the
    # claim fail once via a pre-existing claim file created after the
    # max-scan would... simplest faithful shape: patch _claim_batch_id
    # to lose the race exactly once
    real_claim = med._claim_batch_id
    calls = {"n": 0}

    def lose_first(paths_, bid):
        calls["n"] += 1
        if calls["n"] == 1:
            real_claim(paths_, bid)  # the other writer wins it
            return False
        return real_claim(paths_, bid)

    t1 = t0 + dt.timedelta(hours=1)
    d = _dump(spark, t1, [3, 4])
    import unittest.mock as mock

    with mock.patch.object(med, "_claim_batch_id", lose_first):
        with pytest.raises(med.ConcurrentCommitError, match="claimed"):
            med.ingest_bronze_incremental(spark, d, paths)

    # bronze got the rows (append precedes the mint), manifest did not
    assert med.manifest_versions(spark, paths) == [1]
    bronze_n = spark.read.parquet(paths.bronze).count()
    assert bronze_n == 4

    # retry completes the commit: no bronze double-append, manifest
    # gains the key under a FRESH id past the contended one
    assert med.ingest_bronze_incremental(spark, d, paths) == 1
    assert spark.read.parquet(paths.bronze).count() == 4
    assert med.manifest_versions(spark, paths) == [1, 3]
