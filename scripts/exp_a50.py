"""a50_spearman variant A/B/B/A harness (r15, VERDICT item 1).

Variants (all bit-identical output by construction):
  A  fused union (r14 current registry form)
  B  r13 two-pass (one grouped_cum_before per marginal, np=8)
  C  fused union, NO ranked barrier (branches recompute the window
     from the staged checkpoint inside grouped_cum_before)
  D  fused union, np=8
  E  fused union, no ranked barrier, np=8
Runs interleaved A/B/B/A-style (round-robin over variants, N rounds)
in ONE session with cache clears, prints per-variant medians.

Usage: python scripts/exp_a50.py [-n 4] [--sf DIR] [variants...]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _base_joint(spark, sf_dir):
    from server_spark.barrier import barrier
    from server_spark.sources.synthetic import auctions

    au = auctions(spark, sf_dir)
    base = au.filter(
        F.col("quantity").isNotNull() & F.col("buyout").isNotNull()
    ).select(
        F.col("time_left").alias("g"),
        (F.col("quantity").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("x"),
        (F.col("buyout").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("y"),
    )
    joint = base.groupBy("g", "x", "y").agg(F.count("*").alias("c"))
    return joint.transform(barrier)


def _fold(joint, mx, my):
    from server_spark.parity import r4

    cd = F.col("c").cast("decimal(38,0)")
    s = (
        joint.join(mx, ["g", "x"])
        .join(my, ["g", "y"])
        .groupBy("g")
        .agg(
            F.sum("c").alias("n"),
            F.sum(cd * F.col("rx2")).alias("sx"),
            F.sum(cd * F.col("ry2")).alias("sy"),
            F.sum(cd * F.col("rx2") * F.col("rx2")).alias("sxx"),
            F.sum(cd * F.col("ry2") * F.col("ry2")).alias("syy"),
            F.sum(cd * F.col("rx2") * F.col("ry2")).alias("sxy"),
        )
    )
    n = F.col("n")
    rho = r4(
        (n * 1.0 * F.col("sxy") - F.col("sx") * 1.0 * F.col("sy"))
        / F.sqrt(
            (n * 1.0 * F.col("sxx") - F.col("sx") * 1.0 * F.col("sx"))
            * (n * 1.0 * F.col("syy") - F.col("sy") * 1.0 * F.col("sy"))
        )
    )
    return s.select(
        F.col("g").alias("time_left"), "n", rho.alias("spearman_rho")
    ).orderBy("time_left")


def _fused(spark, sf_dir, np, ranked_barrier, mboth_barrier=False):
    from server_spark.barrier import barrier
    from server_spark.operators.ranking import grouped_cum_before

    joint = _base_joint(spark, sf_dir)
    mboth = (
        joint.groupBy("g", "x")
        .agg(F.sum("c").alias("cv"))
        .select(F.lit(0).alias("_m"), "g", F.col("x").alias("v"), "cv")
        .unionAll(
            joint.groupBy("g", "y")
            .agg(F.sum("c").alias("cv"))
            .select(F.lit(1).alias("_m"), "g", F.col("y").alias("v"), "cv")
        )
    )
    if mboth_barrier:
        mboth = mboth.transform(barrier)
    ranked = grouped_cum_before(
        mboth, ["_m", "g"], "v", "cv", "cb", num_partitions=np
    ).select(
        "_m", "g", "v", (2 * F.col("cb") + F.col("cv") + 1).alias("r2")
    )
    if ranked_barrier:
        ranked = ranked.transform(barrier)
    mx = ranked.filter(F.col("_m") == 0).select(
        "g", F.col("v").alias("x"), F.col("r2").alias("rx2")
    )
    my = ranked.filter(F.col("_m") == 1).select(
        "g", F.col("v").alias("y"), F.col("r2").alias("ry2")
    )
    return _fold(joint, mx, my)


def _twopass(spark, sf_dir, np=8):
    from server_spark.operators.ranking import grouped_cum_before

    joint = _base_joint(spark, sf_dir)

    def marginal(col, out):
        m = joint.groupBy("g", col).agg(F.sum("c").alias("cv"))
        ranked = grouped_cum_before(
            m, ["g"], col, "cv", "cb", num_partitions=np
        )
        return ranked.select(
            "g", col, (2 * F.col("cb") + F.col("cv") + 1).alias(out)
        )

    return _fold(joint, marginal("x", "rx2"), marginal("y", "ry2"))


def _fused_marginal_moments(spark, sf_dir, np, ranked_barrier=True):
    """sx/sxx (sy/syy) folded on the MARGINAL relations: over joint,
    sx = Σ c·rx2 = Σ_x rx2·Σ_y c = Σ_marginal cv·rx2 — identical exact
    integers, but 1 decimal product per joint row (sxy) instead of 5."""
    from server_spark.barrier import barrier
    from server_spark.operators.ranking import grouped_cum_before
    from server_spark.parity import r4

    joint = _base_joint(spark, sf_dir)
    mboth = (
        joint.groupBy("g", "x")
        .agg(F.sum("c").alias("cv"))
        .select(F.lit(0).alias("_m"), "g", F.col("x").alias("v"), "cv")
        .unionAll(
            joint.groupBy("g", "y")
            .agg(F.sum("c").alias("cv"))
            .select(F.lit(1).alias("_m"), "g", F.col("y").alias("v"), "cv")
        )
    )
    ranked = grouped_cum_before(
        mboth, ["_m", "g"], "v", "cv", "cb", num_partitions=np
    ).select(
        "_m", "g", "v", "cv",
        (2 * F.col("cb") + F.col("cv") + 1).alias("r2"),
    )
    if ranked_barrier:
        ranked = ranked.transform(barrier)
    cvd = F.col("cv").cast("decimal(38,0)")
    mom = ranked.groupBy("_m", "g").agg(
        F.sum(cvd * F.col("r2")).alias("s1"),
        F.sum(cvd * F.col("r2") * F.col("r2")).alias("s2"),
    )
    momx = mom.filter(F.col("_m") == 0).select(
        "g", F.col("s1").alias("sx"), F.col("s2").alias("sxx")
    )
    momy = mom.filter(F.col("_m") == 1).select(
        "g", F.col("s1").alias("sy"), F.col("s2").alias("syy")
    )
    mx = ranked.filter(F.col("_m") == 0).select(
        "g", F.col("v").alias("x"), F.col("r2").alias("rx2")
    )
    my = ranked.filter(F.col("_m") == 1).select(
        "g", F.col("v").alias("y"), F.col("r2").alias("ry2")
    )
    cd = F.col("c").cast("decimal(38,0)")
    jnt = (
        joint.join(mx, ["g", "x"])
        .join(my, ["g", "y"])
        .groupBy("g")
        .agg(
            F.sum("c").alias("n"),
            F.sum(cd * F.col("rx2") * F.col("ry2")).alias("sxy"),
        )
    )
    s = jnt.join(momx, "g").join(momy, "g")
    n = F.col("n")
    rho = r4(
        (n * 1.0 * F.col("sxy") - F.col("sx") * 1.0 * F.col("sy"))
        / F.sqrt(
            (n * 1.0 * F.col("sxx") - F.col("sx") * 1.0 * F.col("sx"))
            * (n * 1.0 * F.col("syy") - F.col("sy") * 1.0 * F.col("sy"))
        )
    )
    return s.select(
        F.col("g").alias("time_left"), "n", rho.alias("spearman_rho")
    ).orderBy("time_left")


VARIANTS = {
    "A": lambda s, d: _fused(s, d, 16, True),
    "B": lambda s, d: _twopass(s, d, 8),
    "C": lambda s, d: _fused(s, d, 16, False),
    "D": lambda s, d: _fused(s, d, 8, True),
    "E": lambda s, d: _fused(s, d, 8, False),
    "F": lambda s, d: _fused(s, d, 8, False, mboth_barrier=True),
    "G": lambda s, d: _fused(s, d, 4, False),
    "H": lambda s, d: _fused_marginal_moments(s, d, 8, True),
    "I": lambda s, d: _fused_marginal_moments(s, d, 8, False),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*", default=None)
    ap.add_argument("-n", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    names = args.variants or list(VARIANTS)

    from server_spark.session import get_spark

    spark = get_spark("exp-a50")
    spark.sparkContext.setLogLevel("ERROR")

    def mat(df: DataFrame):
        df.select(F.xxhash64(*df.columns).alias("_h")).agg(
            F.count("_h"), F.expr("bit_xor(_h)")
        ).collect()

    # result-identity check once: all variants hash-equal
    hashes = {}
    for v in names:
        rows = VARIANTS[v](spark, args.sf).collect()
        hashes[v] = tuple(tuple(r) for r in rows)
        spark.catalog.clearCache()
    ref = hashes[names[0]]
    for v, h in hashes.items():
        assert h == ref, f"variant {v} output differs from {names[0]}"
    print(f"identity check OK across {names}")

    times: dict[str, list[float]] = {v: [] for v in names}
    # warmup
    mat(VARIANTS[names[0]](spark, args.sf))
    spark.catalog.clearCache()
    order = names + names[::-1]  # A/B/../B/A inside each round pair
    for r in range(args.n):
        for v in order:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            mat(VARIANTS[v](spark, args.sf))
            times[v].append(time.perf_counter() - t0)
    for v in names:
        ts = times[v]
        print(
            f"{v}: median={statistics.median(ts):.3f}s min={min(ts):.3f}s "
            f"runs={[round(t, 2) for t in ts]}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
