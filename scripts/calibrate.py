"""Host CPU-calibration probe for bench adjudication.

Rounds 4/5 and 10 each lost a close cycle to host-level slow windows:
the shared sandbox's effective speed moved 1.2-2.0x between runs with
the box otherwise idle, producing phantom per-query "regressions"
that survived even median drift normalization when the slowdown was
non-uniform (r10's contended-window ledger, SCALE.md). The manual
protocol was to probe two reference queries in isolation and write a
ledger note; this module automates the probe.

``score()`` runs a fixed, data-independent workload — a pinned-seed
numpy matmul loop (BLAS-threaded: sensitive to the same CPU/memory
contention Spark executors feel) plus a pure-Python busy loop
(single-core interpreter speed) — and returns the elapsed seconds
(lower = faster host). The MIN of several repeats is kept: the min is
the least-contended sample, so a slow score means even the best
window during the probe was slow — a host property, not noise.

bench.py records the score in its artifacts; bench_diff.py compares
fresh vs baseline scores and DEFERS adjudication (exit 3, distinct
from the gate-fail exit 1) when the host ran >1.3x slower than when
the baseline was recorded — per-query ratios from such a window are
not evidence of plan regressions.
"""

from __future__ import annotations

import time


def score(repeats: int = 5) -> float:
    """Seconds for the fixed calibration workload (min over repeats)."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.random((384, 384))
    b = rng.random((384, 384))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        # BLAS leg: 8 matmuls (~0.9 GFLOP) — contended-CPU sensitive
        c = a
        for _ in range(8):
            c = (c @ b) * 1e-2
        # interpreter leg: fixed Python-loop work
        s = 0
        for i in range(200_000):
            s += i * i
        best = min(best, time.perf_counter() - t0)
        del c, s
    return round(best, 4)


def jvm_score(spark, repeats: int = 3, warmups: int = 3) -> float:
    """Seconds for a fixed SPARK workload (min over repeats) — the
    JVM/shuffle leg (r12, VERDICT r11 item 2). The CPU probe above
    measures BLAS+interpreter speed only; r11's artifact showed the
    two can split (probe 0.91x faster, queries 1.13x slower) when the
    contention is JVM/IO-side. This leg times a pinned shuffle
    aggregation through the live session, so it drifts WITH the
    queries. Recorded separately (``calibration_jvm_sec``) to keep
    the CPU score comparable with pre-r12 baselines; bench_diff uses
    the more pessimistic of the two ratios when both artifacts carry
    both legs.

    Warmups (r13): the probe's START-of-run reading was confounded
    with JVM JIT tiering — even min-of-3 right after session start
    read 2–4x the end-of-run leg (observed 0.375 vs 0.098 s on an
    idle host), which the deferral gate misread as a contended
    window every run. A few UNTIMED executions first let C2 compile
    the shuffle path so the timed legs measure the WINDOW, not the
    JIT; the probe's job is window comparison, never absolute
    speed."""
    def _probe() -> None:
        (
            spark.range(2_000_000, numPartitions=8)
            .selectExpr("id % 1024 AS k", "id AS v")
            .groupBy("k")
            .sum("v")
            .collect()
        )

    for _ in range(warmups):
        _probe()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _probe()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


if __name__ == "__main__":
    print(score())
