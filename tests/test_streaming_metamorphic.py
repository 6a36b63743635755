"""Config-metamorphic axis for STREAMING pipelines (r8 verdict item 6).

The batch metamorphic suite (test_config_metamorphic.py) asserts query
results are invariant under config changes; this file extends the same
contract to stateful streaming: for two pipelines — the windowed
aggregation (hourly_price_stream) and the custom stateful operator
(price_delta_stateful, applyInPandasWithState) — the drained output
must be IDENTICAL under

  * state store backend: default HDFS-heap provider vs RocksDB, and
  * micro-batch split: all input in ONE micro-batch vs one file per
    micro-batch (maxFilesPerTrigger=1),

because windowed aggs are algebraic merges and the delta operator
sorts snapshots inside the update and carries state across batches —
neither may depend on where the engine happens to cut batches or
where it keeps its state rows.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from server_spark.schemas import AUCTION
from server_spark.streaming import pipeline as sp

# r15: each metamorphic case re-runs a full streaming pipeline under
# alternate state-store backends and input splits (~100 s apiece,
# 236 s total) — a multi-minute gate, not a unit test. Round-close
# full runs include it (`pytest -m ""`).
pytestmark = pytest.mark.slow

T0 = dt.datetime(2024, 1, 1, 10, 0)
T1 = dt.datetime(2024, 1, 1, 11, 10)
T2 = dt.datetime(2024, 1, 1, 12, 20)
T3 = dt.datetime(2024, 1, 1, 18, 0)  # watermark pusher

# (auc, item, buyout, qty) per snapshot — two items with shifting
# prices so the delta operator has real prev/next structure
SNAPSHOTS = [
    (T0, [(1, 100, 500, 1), (2, 100, 900, 3), (3, 200, 700, 2)]),
    (T1, [(4, 100, 600, 1), (5, 200, 900, 2)]),
    (T2, [(6, 100, 550, 1), (7, 200, 950, 2), (8, 300, 100, 1)]),
    (T3, [(9, 300, 120, 1)]),
]


def _write_input(spark, input_dir: str, split: str) -> None:
    os.makedirs(input_dir, exist_ok=True)
    if split == "many":  # one file per snapshot → one micro-batch each
        for ts, rows in SNAPSHOTS:
            _df(spark, ts, rows).coalesce(1).write.mode("append").parquet(
                input_dir
            )
    else:  # everything in one file → one micro-batch
        dfs = None
        for ts, rows in SNAPSHOTS:
            d = _df(spark, ts, rows)
            dfs = d if dfs is None else dfs.unionByName(d)
        dfs.coalesce(1).write.mode("append").parquet(input_dir)


def _df(spark, ts, rows):
    data = [
        (auc, item, "o", "r1", 9, buyout, qty, "LONG", "eu", "r1", ts)
        for auc, item, buyout, qty in rows
    ]
    return spark.createDataFrame(data, AUCTION)


def _drain(spark, build_stream, base: str, backend: str, split: str):
    """Write input per ``split``, run the pipeline to parquet under
    ``backend``, drain twice (the second availableNow run flushes
    windows finalized by the first run's watermark advance), return
    the sorted output rows."""
    input_dir = os.path.join(base, "in")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    _write_input(spark, input_dir, split)
    if backend == "rocksdb":
        sp.use_rocksdb_state(spark)
    try:
        for _ in range(2):
            q = sp.run_to_parquet(
                build_stream(spark, input_dir), out_dir, ckpt
            )
            q.awaitTermination()
    finally:
        sp.use_default_state(spark)
    try:
        rows = spark.read.parquet(out_dir).collect()
    except Exception:  # noqa: BLE001 — no output files
        return []
    return sorted(tuple(r) for r in rows)


def _hourly(spark, input_dir):
    return sp.hourly_price_stream(
        sp.read_auction_stream(spark, input_dir, max_files=1),
        late="0 seconds",
    )


def _delta(spark, input_dir):
    return sp.price_delta_stateful(
        sp.read_auction_stream(spark, input_dir, max_files=1)
    )


PIPELINES = {"hourly_window": _hourly, "price_delta_stateful": _delta}
COMBOS = [
    ("default", "many"),
    ("rocksdb", "one"),
    ("rocksdb", "many"),
]


@pytest.mark.parametrize("pipeline", sorted(PIPELINES))
def test_stream_results_invariant_under_backend_and_split(
    spark, tmp_path, pipeline
):
    build = PIPELINES[pipeline]
    baseline = _drain(
        spark, build, str(tmp_path / "base"), "default", "one"
    )
    assert baseline, f"{pipeline}: baseline drain produced no rows"
    for backend, split in COMBOS:
        got = _drain(
            spark,
            build,
            str(tmp_path / f"{backend}_{split}"),
            backend,
            split,
        )
        assert got == baseline, (
            f"{pipeline}: output differs under backend={backend} "
            f"split={split}"
        )


def test_rocksdb_combo_engaged(spark, tmp_path):
    """The rocksdb×many combo must actually exercise the RocksDB
    provider (guard against the conf silently not applying): the
    checkpoint state dir contains RocksDB artifacts."""
    base = str(tmp_path / "probe")
    _drain(spark, _delta, base, "rocksdb", "many")
    state_root = os.path.join(base, "ckpt", "state")
    artifacts = []
    for root, _dirs, files in os.walk(state_root):
        artifacts += [f for f in files if f.endswith((".zip", ".changelog"))]
    assert artifacts, "no RocksDB snapshot/changelog artifacts found"


# ---------------------------------------------------------------------------
# CDC chunk-profile streaming fold: incremental == one-shot
# ---------------------------------------------------------------------------

# long enough that CDC boundaries fire (E[chunk] = 16 tokens), so the
# shifted mirror in batch 1 re-synchronizes onto shared chunk hashes
_BODY = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
    "psi omega one two three four five six seven eight nine ten "
    "eleven twelve thirteen fourteen fifteen sixteen seventeen "
    "eighteen nineteen twenty alpha2 beta2 gamma2 delta2 "
    "epsilon2 zeta2 eta2 theta2 iota2 kappa2 lambda2 mu2 nu2 "
    "xi2 omicron2 pi2 rho2 sigma2 tau2 upsilon2"
)
DOCS_B0 = [
    (1, _BODY, "web"),
    (2, _BODY, "wiki"),
]
DOCS_B1 = [
    (3, "completely different words about spark dataframes shuffles "
        "exchanges partitions codegen catalyst tungsten arrow", "web"),
    (4, "breaking news prefix inserted here " + _BODY, "news"),
]


def _write_doc_json(spark, input_dir, name, rows):
    import json

    os.makedirs(input_dir, exist_ok=True)
    with open(os.path.join(input_dir, f"{name}.json"), "w") as fh:
        for doc_id, text, source in rows:
            fh.write(json.dumps(
                {"doc_id": doc_id, "text": text, "source": source}
            ) + "\n")


def test_cdc_profile_stream_incremental_equals_oneshot(spark, tmp_path):
    """The epoch-gated CDC fold over micro-batches equals the batch
    x117 profile over all documents seen so far, at every boundary
    and across a checkpoint resume."""
    input_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def oneshot(all_rows):
        import pandas as pd

        docs = pd.DataFrame(
            all_rows, columns=["doc_id", "text", "source"]
        )
        docs["lang"] = "en"
        docs["n_chars"] = docs["text"].str.len()
        td = str(tmp_path / f"oneshot_{len(all_rows)}")
        os.makedirs(td, exist_ok=True)
        docs.to_parquet(os.path.join(td, "documents.parquet"),
                        index=False)
        from server_spark.registry import queries

        return sorted(
            tuple(r)
            for r in queries()["x117_cdc_chunks"](spark, td).collect()
        )

    _write_doc_json(spark, input_dir, "b0", DOCS_B0)
    q = sp.cdc_profile_stream(spark, input_dir, state_dir, ckpt)
    q.awaitTermination()
    got = sorted(
        tuple(r)
        for r in sp.read_cdc_profile_state(spark, state_dir).collect()
    )
    assert got == oneshot(DOCS_B0)

    # resume from checkpoint: only the new file folds
    _write_doc_json(spark, input_dir, "b1", DOCS_B1)
    q2 = sp.cdc_profile_stream(spark, input_dir, state_dir, ckpt)
    q2.awaitTermination()
    got2 = sorted(
        tuple(r)
        for r in sp.read_cdc_profile_state(spark, state_dir).collect()
    )
    assert got2 == oneshot(DOCS_B0 + DOCS_B1)
    # the shifted mirror in batch 1 (doc 4) re-synchronized onto doc
    # 1/2's chunks: 'news' shares content cross-source
    by_source = {r[0]: r for r in got2}
    assert by_source["news"][5] > 0  # cross_source_share


def test_decontaminate_stream_flags_shifted_mirror(spark, tmp_path):
    """Streaming decontamination: an arriving eval doc that quotes a
    train doc behind a fresh preamble is flagged (shift-invariant),
    a clean doc passes with zero hits, and verdicts accumulate across
    micro-batches / checkpoint resume."""
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    train = spark.createDataFrame(
        [(100, _BODY)], "doc_id long, text string"
    )
    _write_doc_json(
        spark, input_dir, "b0",
        [(1, "inserted preamble shifts everything " + _BODY, "eval")],
    )
    q = sp.decontaminate_stream(spark, input_dir, train, out_dir, ckpt)
    q.awaitTermination()
    _write_doc_json(
        spark, input_dir, "b1",
        [(2, "totally unrelated clean content with fresh words only",
          "eval")],
    )
    q2 = sp.decontaminate_stream(spark, input_dir, train, out_dir, ckpt)
    q2.awaitTermination()

    rows = {
        r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()
    }
    assert set(rows) == {1, 2}
    assert rows[1]["flagged"] and rows[1]["hit_share"] > 0.5
    assert not rows[2]["flagged"] and rows[2]["n_hit"] == 0
