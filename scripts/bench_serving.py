"""Serving-latency micro-bench over the request/reply façade
(`server_spark/api.py`) — the reference was an INTERACTIVE NATS server
(BASELINE.md: sub-second reads), so cold batch throughput (bench.py)
isn't the whole story. This bench models the serving steady state: a
WARM session with the hot relations cached in executor memory (the
role the reference's in-process Bolt DBs play), then repeated
parameterized subject calls, reporting p50/p95 wall latency per
subject. Measurement + gate logic live in
``server_spark/serving_gate.py`` (shared with tests/test_serving_gate.py,
the pytest gate that fails on drift-normalized façade regressions).

Prints ONE JSON line:
{"metric": "serving_latency_sec", "subjects": {name: {"p50": s,
"p95": s, "n": iters}}, "sf": ..., "warm_cache": true}
and writes it to SERVING_FULL.json at the repo root.

Usage:
    python scripts/bench_serving.py [--iters N] [sf_dir]
    python scripts/bench_serving.py --accept
        copy SERVING_FULL.json over scripts/serving_baseline.json
        (the recorded sf0.1 reference numbers)
    python scripts/bench_serving.py --accept-test-baseline
        re-measure at the pytest gate's scale (sf0.01, its iters) and
        overwrite scripts/serving_baseline_sf001.json — run after an
        INTENDED façade/plan change, commit the refreshed file
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
FRESH = REPO / "SERVING_FULL.json"
BASELINE = REPO / "scripts" / "serving_baseline.json"
TEST_BASELINE = REPO / "scripts" / "serving_baseline_sf001.json"

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# the pytest gate's measurement shape (kept here so --accept-test-baseline
# and the test can't drift apart)
TEST_SF_DIR = "/root/testdata/sf0.01"
TEST_ITERS = 7
TEST_WARMUP = 2


def _measure(sf_dir: str, iters: int, warmup: int = 3) -> dict:
    from server_spark.serving_gate import run_serving_bench
    from server_spark.session import get_spark

    spark = get_spark("server-spark-serving-bench")
    spark.sparkContext.setLogLevel("ERROR")
    results = run_serving_bench(spark, sf_dir, iters=iters, warmup=warmup)
    return {
        "metric": "serving_latency_sec",
        "subjects": results,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "warm_cache": True,
    }


def main() -> int:
    argv = sys.argv[1:]
    if "--accept" in argv:
        BASELINE.write_text(FRESH.read_text())
        print(f"serving baseline refreshed from {FRESH}")
        return 0
    if "--accept-test-baseline" in argv:
        out = _measure(TEST_SF_DIR, TEST_ITERS, TEST_WARMUP)
        TEST_BASELINE.write_text(json.dumps(out, indent=2) + "\n")
        print(f"pytest-gate baseline refreshed: {TEST_BASELINE}")
        return 0

    iters = 20
    if "--iters" in argv:
        k = argv.index("--iters")
        iters = int(argv[k + 1])
        argv = argv[:k] + argv[k + 2:]
    sf_dir = argv[0] if argv else SF_DIR

    out = _measure(sf_dir, iters)
    FRESH.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
