#!/usr/bin/env python
"""Empirical probe: one-task-per-group window vs the two-phase
grouped prefix sum (operators/ranking.grouped_cum_before).

The a50 trade shipped on an argument (a group's whole distinct-value
relation lands in ONE window task); this probe measures the axis
directly, the probe_hot_bucket pattern: N distinct values in FOUR
groups (a50's shape), cumulative weighted prefix within each group,
naive `SUM() OVER (PARTITION BY g ORDER BY v)` vs grouped_cum_before.
The naive shape's per-group task is a serial sort+scan; the two-phase
shape spreads each group over range partitions. Run:

    python scripts/probe_two_phase_rank.py [n_distinct_per_group]

Emits one JSON line with both timings and the count cross-check
(results must be identical — the probe is also a correctness check
at a scale the unit tests don't reach).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from server_spark.operators.ranking import grouped_cum_before
    from server_spark.session import get_spark

    spark = get_spark("probe-two-phase-rank")
    spark.sparkContext.setLogLevel("ERROR")

    # 4 groups × n distinct values, weight = deterministic small int
    base = (
        spark.range(4 * n)
        .select(
            (F.col("id") % 4).cast("int").alias("g"),
            (F.col("id") / 4).cast("long").alias("v"),
            (F.xxhash64("id") % 7 + 7).alias("w"),
        )
        .localCheckpoint()  # timings exclude the generator
    )

    def timed(fn):
        t0 = time.perf_counter()
        out = fn()
        return out, time.perf_counter() - t0

    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    naive = base.select(
        "g", "v",
        F.coalesce(F.sum("w").over(w), F.lit(0)).alias("cb"),
    )
    two = grouped_cum_before(base, ["g"], "v", "w", "cb")

    agg = lambda df: df.agg(  # noqa: E731
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(g, v, cb))").alias("chk"),
    ).collect()[0]

    (r_naive, t_naive) = timed(lambda: agg(naive))
    (r_two, t_two) = timed(lambda: agg(two))
    match = (r_naive["n"], r_naive["chk"]) == (r_two["n"], r_two["chk"])
    print(
        json.dumps(
            {
                "n_distinct_per_group": n,
                "rows": 4 * n,
                "naive_window_sec": round(t_naive, 2),
                "two_phase_sec": round(t_two, 2),
                "results_match": match,
                "speedup": round(t_naive / t_two, 2) if t_two else None,
            }
        )
    )
    return 0 if match else 1


if __name__ == "__main__":
    raise SystemExit(main())
