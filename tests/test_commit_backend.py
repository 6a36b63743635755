"""Pluggable put-if-absent commit backend (r13, VERDICT r12 item 2).

The medallion claim/lock machinery's correctness must come from the
backend PROTOCOL (conditional PUT / GET / LIST / DELETE), not from the
O_EXCL primitive the default local backend happens to use. These tests
prove the contract over a backend that does NOT use O_EXCL
(LinkConditionalPutBackend — stage + os.link, the local analog of an
S3 If-None-Match PUT), exercise the env/explicit injection rules the
JPEG codec hook established, and pin that object-store URI roots route
every correctness-bearing operation through the backend and never
touch the local filesystem.
"""

from __future__ import annotations

import json
import os
import threading
import time

import pytest

from server_spark.plans import commit_backend as cb
from server_spark.plans import medallion as med


class MemBackend:
    """In-memory object store: flat key space, no directories, no
    rename — the verbs a bucket actually has."""

    def __init__(self):
        self.objs: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def put_if_absent(self, path: str, payload: bytes) -> bool:
        with self._lock:
            if path in self.objs:
                return False
            self.objs[path] = payload
            return True

    def put(self, path: str, payload: bytes) -> None:
        self.objs[path] = payload

    def read(self, path: str):
        return self.objs.get(path)

    def list_names(self, prefix: str):
        p = prefix.rstrip("/") + "/"
        return [k[len(p):] for k in self.objs if k.startswith(p)]

    def delete(self, path: str) -> None:
        self.objs.pop(path, None)


@pytest.mark.parametrize(
    "backend_cls", [cb.LocalFSBackend, cb.LinkConditionalPutBackend]
)
def test_put_if_absent_exactly_one_winner(tmp_path, backend_cls):
    """The correctness-bearing verb: N concurrent writers of one key,
    exactly one True — for the O_EXCL default AND the link-based
    conditional-put fake."""
    be = backend_cls()
    key = str(tmp_path / "claims" / "7")
    wins = []

    def attempt(i):
        if be.put_if_absent(key, f"writer-{i}".encode()):
            wins.append(i)

    threads = [threading.Thread(target=attempt, args=(i,))
               for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    # the winner's payload is what landed, fully written
    assert be.read(key) == f"writer-{wins[0]}".encode()
    # and the loser's staged temp objects were cleaned up
    assert list(be.list_names(str(tmp_path / "claims"))) == ["7"]


def test_backend_verbs_roundtrip(tmp_path):
    be = cb.LocalFSBackend()
    root = str(tmp_path / "t")
    assert list(be.list_names(root)) == []  # absent prefix lists empty
    assert be.read(os.path.join(root, "x")) is None
    be.put(os.path.join(root, "a", "x"), b"1")
    be.put(os.path.join(root, "a", "x"), b"2")  # overwrite allowed
    assert be.read(os.path.join(root, "a", "x")) == b"2"
    assert be.put_if_absent(os.path.join(root, "a", "x"), b"3") is False
    names = list(be.list_names(root))
    assert names == [os.path.join("a", "x")]
    be.delete(os.path.join(root, "a", "x"))
    be.delete(os.path.join(root, "a", "x"))  # idempotent
    assert be.read(os.path.join(root, "a", "x")) is None


def test_injected_backend_resolution(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_COMMIT_BACKEND", raising=False)
    assert cb.injected_backend() is None
    monkeypatch.setenv(
        "SPARK_GRAFT_COMMIT_BACKEND",
        "server_spark.plans.commit_backend:LinkConditionalPutBackend",
    )
    be = cb.injected_backend()
    assert isinstance(be, cb.LinkConditionalPutBackend)
    assert cb.injected_backend() is be  # cached per spec
    # configured-but-broken must raise loudly, never fall back: a
    # silent local-O_EXCL fallback on a bucket deployment silently
    # loses multi-driver exclusion
    monkeypatch.setenv("SPARK_GRAFT_COMMIT_BACKEND", "no_such_mod:f")
    with pytest.raises(ImportError):
        cb.injected_backend()
    # resolvable but not a backend (missing verbs)
    monkeypatch.setenv("SPARK_GRAFT_COMMIT_BACKEND", "builtins:object")
    with pytest.raises(TypeError):
        cb.injected_backend()


def test_uri_roots_gated_on_backend(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_COMMIT_BACKEND", raising=False)
    with pytest.raises(ValueError, match="local-FS only"):
        med.MedallionPaths("s3://bucket/lake")
    # explicit backend wins
    p = med.MedallionPaths("s3://bucket/lake", backend=MemBackend())
    assert p.is_uri and p.manifest.startswith("s3://bucket/lake/")
    # env hook accepts too
    monkeypatch.setenv(
        "SPARK_GRAFT_COMMIT_BACKEND",
        "server_spark.plans.commit_backend:LinkConditionalPutBackend",
    )
    assert med.MedallionPaths("gs://bucket/lake").is_uri
    # local roots and file: URIs keep the r12 normalization behavior
    lp = med.MedallionPaths("file:/tmp/lake")
    assert not lp.is_uri and lp.root == "/tmp/lake"
    with pytest.raises(ValueError, match="remote-host"):
        med.MedallionPaths("file://otherhost/lake")


def test_claims_route_through_backend_on_uri_root(monkeypatch):
    """On a bucket root the claim machinery must do its entire job
    through the backend — the os.* fallback would silently read
    'absent' and re-mint history."""
    be = MemBackend()
    paths = med.MedallionPaths("s3://bucket/lake", backend=be)
    assert med._max_claimed_id(paths) == 0
    assert med._claim_batch_id(paths, 1) is True
    assert med._claim_batch_id(paths, 1) is False  # exactly once
    assert med._claim_batch_id(paths, 2) is True
    assert med._max_claimed_id(paths) == 2
    # keys live in the bucket namespace, not the local fs
    claims = "s3://bucket/lake/manifest/ingested_dumps/_claims"
    assert set(be.objs) == {f"{claims}/1", f"{claims}/2"}
    assert not os.path.exists("s3:")
    med._prune_claims(paths, below=2)
    assert set(be.objs) == {f"{claims}/2"}
    # the never-written probe routes through LIST: hidden components
    # (_claims) do not count as table data
    assert med._table_has_data(paths, paths.manifest) is False
    be.put("s3://bucket/lake/manifest/ingested_dumps/part-0.parquet",
           b"x")
    assert med._table_has_data(paths, paths.manifest) is True


def test_backend_lock_mutual_exclusion(tmp_path):
    """The backend lock variant serializes a critical section using
    only protocol verbs (claim via conditional PUT, release via
    token-checked DELETE)."""
    be = cb.LinkConditionalPutBackend()
    root = str(tmp_path / "lake")
    order: list[str] = []

    def hold(tag):
        with med.commit_lock(root, timeout=30.0, backend=be):
            order.append(f"{tag}-in")
            time.sleep(0.2)
            order.append(f"{tag}-out")

    threads = [threading.Thread(target=hold, args=(t,)) for t in "ab"]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert order in (["a-in", "a-out", "b-in", "b-out"],
                     ["b-in", "b-out", "a-in", "a-out"])
    # released: CAS-capable backends leave a tombstone (r14 — release
    # is a CAS swap, never a delete that could kill a breaker's fresh
    # claim); the tombstone reads as free to the next contender
    final = json.loads(be.read(os.path.join(root, "manifest",
                                            ".commit.lock")))
    assert final.get("released") is True


def test_backend_lock_breaks_dead_holder(tmp_path):
    """A holder whose process died stops rewriting beat_at; the next
    contender breaks the lock after stale_after without a heartbeat."""
    be = cb.LinkConditionalPutBackend()
    root = str(tmp_path / "lake")
    lockfile = os.path.join(root, "manifest", ".commit.lock")
    be.put_if_absent(lockfile, json.dumps(
        {"token": "dead", "beat_at": time.time() - 5.0}).encode())
    with med.commit_lock(root, timeout=5.0, stale_after=1.0, backend=be):
        doc = json.loads(be.read(lockfile))
        assert doc["token"] != "dead"
    assert json.loads(be.read(lockfile)).get("released") is True


def test_replace_if_match_exactly_one_winner(tmp_path):
    """The optional CAS verb (r13): N concurrent swappers against the
    same expected payload — exactly one True, and the object ends as
    the winner's payload (the S3 If-Match etag PUT analog)."""
    be = cb.LocalFSBackend()
    key = str(tmp_path / "lock")
    be.put(key, b"stale-holder")
    wins = []

    def attempt(i):
        if be.replace_if_match(key, b"claim-%d" % i, b"stale-holder"):
            wins.append(i)

    threads = [threading.Thread(target=attempt, args=(i,))
               for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    assert be.read(key) == b"claim-%d" % wins[0]
    # wrong expected payload never swaps
    assert be.replace_if_match(key, b"x", b"stale-holder") is False
    # absent key never swaps
    assert be.replace_if_match(key + "2", b"x", b"y") is False


def test_stale_break_is_atomic_with_cas_backend(tmp_path):
    """With a CAS-capable backend, breaking IS acquiring: many
    contenders racing one stale lock produce exactly one holder at a
    time (the read-check-delete double-break window does not exist),
    and every contender eventually gets its turn."""
    be = cb.LocalFSBackend()  # has replace_if_match
    root = str(tmp_path / "lake")
    lockfile = os.path.join(root, "manifest", ".commit.lock")
    be.put_if_absent(lockfile, json.dumps(
        {"token": "dead", "beat_at": time.time() - 50.0}).encode())
    state = {"active": 0, "max_active": 0}
    guard = threading.Lock()

    def contend(tag):
        with med.commit_lock(root, timeout=30.0, stale_after=1.0,
                             backend=be):
            with guard:
                state["active"] += 1
                state["max_active"] = max(state["max_active"],
                                          state["active"])
            time.sleep(0.05)
            with guard:
                state["active"] -= 1

    threads = [threading.Thread(target=contend, args=(i,))
               for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert state["max_active"] == 1, state
    # last holder's release tombstone (CAS backend — see r14 protocol)
    assert json.loads(be.read(lockfile)).get("released") is True


def test_backend_lock_timeout(tmp_path):
    be = cb.LinkConditionalPutBackend()
    root = str(tmp_path / "lake")
    lockfile = os.path.join(root, "manifest", ".commit.lock")
    be.put_if_absent(lockfile, cb.lock_payload("live-holder"))
    with pytest.raises(TimeoutError):
        with med.commit_lock(root, timeout=0.3, stale_after=600.0,
                             backend=be):
            pass


def test_commit_lock_uri_root_requires_backend(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_COMMIT_BACKEND", raising=False)
    with pytest.raises(ValueError, match="needs a commit backend"):
        with med.commit_lock("s3://bucket/lake"):
            pass


def test_multiprocess_mint_race_over_conditional_put_backend(tmp_path):
    """THE contract test (VERDICT r12 item 2 'done' bar): four real
    processes concurrently mint manifest versions through the
    NON-O_EXCL conditional-put backend — no lost and no duplicate
    batch id. Each worker wins exactly five claims via the real
    _claim_batch_id/_max_claimed_id machinery (explicit backend, no
    env); the final claim set must be exactly 1..20, each id claimed
    by exactly one pid."""
    import subprocess
    import sys

    root = str(tmp_path / "lake")
    os.makedirs(root, exist_ok=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    worker = f"""
import os, sys
sys.path.insert(0, {repo!r})
from server_spark.plans import commit_backend as cb
from server_spark.plans import medallion as med
paths = med.MedallionPaths({root!r},
                           backend=cb.LinkConditionalPutBackend())
wins = 0
while wins < 5:
    nxt = med._max_claimed_id(paths) + 1
    if med._claim_batch_id(paths, nxt):
        wins += 1
print("done")
"""
    procs = [
        subprocess.Popen([sys.executable, "-c", worker],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for _ in range(4)
    ]
    for p in procs:
        _, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()

    claims_dir = os.path.join(root, "manifest", "ingested_dumps",
                              "_claims")
    ids = sorted(int(n) for n in os.listdir(claims_dir))
    assert ids == list(range(1, 21)), (
        f"lost/duplicate batch id under concurrent minting: {ids}"
    )
    # each claim payload names exactly one owning pid
    pids = set()
    for n in ids:
        with open(os.path.join(claims_dir, str(n))) as fh:
            pids.add(json.loads(fh.read())["pid"])
    assert len(pids) == 4  # all four writers really won claims


def test_maintenance_layer_rejects_uri_paths():
    """The rename/walk/sidecar maintenance machinery must FAIL LOUDLY
    on bucket paths, not silently no-op: os.walk over a bucket URI
    yields nothing (compaction reports the table clean, schema_drift
    reports no drift) and os.path.exists reads absent (_gold_watermark
    would return the never-written epoch and a gold fold would
    double-apply)."""
    from server_spark.plans import maintenance as mnt

    for fn, args in (
        (mnt.partition_file_stats, ("s3://bucket/lake/gold",)),
        (mnt.schema_drift, (None, "s3://bucket/lake/gold")),
        (mnt._gold_watermark, ("s3://bucket/lake/gold/t",)),
        (med.compact_small_files, (None, "s3://bucket/lake/gold")),
    ):
        with pytest.raises(ValueError, match="local-FS only"):
            fn(*args)


def test_file_uri_normalizes_instead_of_silent_noop(tmp_path):
    """r13 review: lowercase 'file:' URIs sailed past the bucket
    check unnormalized, and os.walk/os.path.exists on them silently
    no-op — the exact failure the guard exists to block. The shared
    gate (cb.local_path) must NORMALIZE them so the maintenance
    machinery sees the real path."""
    from server_spark.plans import maintenance as mnt

    gold = tmp_path / "gold" / "t"
    gold.mkdir(parents=True)
    (gold / "_watermark").write_text(json.dumps({"batch_id": 7}))
    # a file: spelling of the same dir reads the REAL watermark —
    # pre-fix it read {} (never-written) and a fold would double-apply
    assert mnt._gold_watermark(f"file:{gold}") == {"batch_id": 7}
    assert cb.local_path(f"file://{gold}", "t") == str(gold)
    assert cb.local_path("FILE:/x/y", "t") == "/x/y"  # case-insensitive
    with pytest.raises(ValueError, match="local-FS only"):
        cb.local_path("S3://bucket/x", "t")  # uppercase scheme too
    with pytest.raises(ValueError, match="remote-host"):
        cb.local_path("file://otherhost/x", "t")


def test_commit_lock_uses_injected_backend_for_local_roots(tmp_path,
                                                           monkeypatch):
    """r13 review: compact_small_files takes commit_lock(root) with no
    backend argument; when the env hook is set, EVERY commit_lock on
    any root must resolve the injected backend so direct callers and
    _lock_backend callers share one lock namespace — a POSIX-vs-
    backend split voids writer/compaction mutual exclusion."""
    monkeypatch.setenv(
        "SPARK_GRAFT_COMMIT_BACKEND",
        "server_spark.plans.commit_backend:LinkConditionalPutBackend",
    )
    root = str(tmp_path / "lake")
    lockfile = os.path.join(root, "manifest", ".commit.lock")
    with med.commit_lock(root, timeout=10.0):
        # the backend lock writes a JSON payload with beat_at — the
        # POSIX lock writes token/claimed_at only
        doc = json.loads(open(lockfile).read())
        assert "beat_at" in doc
    # CAS backend → release tombstone, not a deleted lockfile (r14)
    assert json.loads(open(lockfile).read()).get("released") is True


def test_backend_lock_timeout_under_release_churn(tmp_path):
    """r13 review: the acquire loop skipped the deadline check on the
    released-between-claim-and-read and stale-break paths, so a
    starved contender could spin past its timeout forever. A holder
    that keeps the lock under rapid re-claim churn must still produce
    TimeoutError within bounds."""
    be = cb.LinkConditionalPutBackend()
    root = str(tmp_path / "lake")
    lockfile = os.path.join(root, "manifest", ".commit.lock")
    stop = threading.Event()

    def churn():
        # rapidly release+reclaim so the contender often reads None
        while not stop.is_set():
            be.delete(lockfile)
            be.put_if_absent(lockfile, cb.lock_payload("churner"))

    t = threading.Thread(target=churn, daemon=True)
    t.start()
    t0 = time.monotonic()
    try:
        with pytest.raises(TimeoutError):
            with med.commit_lock(root, timeout=0.5, stale_after=600.0,
                                 backend=be):
                pass  # pragma: no cover — churn may briefly yield it
    except BaseException:
        # the contender may WIN a gap in the churn; that's not a
        # deadline-skip bug — only an unbounded spin is
        pass
    finally:
        stop.set()
        t.join(timeout=5.0)
    assert time.monotonic() - t0 < 30.0  # bounded, not an infinite spin


def test_burned_id_skipped_through_backend_on_uri_root():
    """Crash recovery is backend-independent: a claim with no manifest
    append (writer died between the two) BURNS that version, and the
    next mint must skip it — through the backend's LIST verb on a
    bucket root, where the old os.listdir would have read nothing and
    silently re-minted the burned id for a different dump set."""
    be = MemBackend()
    paths = med.MedallionPaths("s3://bucket/lake", backend=be)
    assert med._claim_batch_id(paths, 1)
    assert med._claim_batch_id(paths, 2)  # crashed writer's burn
    # next mint computes max(manifest=none, claimed)+1 = 3, never 2
    assert med._max_claimed_id(paths) == 2
    assert med._claim_batch_id(paths, med._max_claimed_id(paths) + 1)
    claims = "s3://bucket/lake/manifest/ingested_dumps/_claims"
    assert set(be.objs) == {f"{claims}/1", f"{claims}/2", f"{claims}/3"}


def test_ingest_pipeline_with_injected_backend(spark, tmp_path,
                                               monkeypatch):
    """End-to-end: the full manifest-gated ingest runs with the env
    hook pointing at the conditional-put backend — backend lock,
    backend claims, backend never-written probe — and keeps the exact
    idempotency semantics the local path has."""
    import datetime as dt

    from pyspark.sql import functions as F

    monkeypatch.setenv(
        "SPARK_GRAFT_COMMIT_BACKEND",
        "server_spark.plans.commit_backend:LinkConditionalPutBackend",
    )
    paths = med.MedallionPaths(str(tmp_path / "lake"))
    ts = dt.datetime(2026, 8, 1, 12, 0, 0)
    raw = spark.createDataFrame(
        [("eu", "r1", ts, a, 100, 500, 1) for a in range(10)],
        "region string, realm_slug string, dump_ts timestamp, "
        "auc long, item long, buyout long, quantity long",
    )
    assert med.ingest_bronze_incremental(spark, raw, paths) == 1
    # re-delivery: manifest gate holds through the backend probe
    assert med.ingest_bronze_incremental(spark, raw, paths) == 0
    m = med.load_manifest(spark, paths)
    assert m.count() == 1
    assert m.select(F.max("batch_id")).first()[0] == 1
    # the claim landed through the backend (pruned after commit is
    # fine — at most the latest id remains)
    claims = os.path.join(paths.root, "manifest", "ingested_dumps",
                          "_claims")
    assert {int(n) for n in os.listdir(claims)} <= {1}
