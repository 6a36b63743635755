"""Interleaved A/B harness for r15 candidates: t30 (dedupe the med
subtree via a dev barrier), a43 (checkpoint gated once), a38 (fanned
melt). Variants are registry-identical in output; each pair runs
round-robin in one session with cache clears.

Usage: python scripts/exp_misc.py [-n 4] [--sf DIR] t30A t30B ...
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402


def t30(spark, sf_dir, dev_barrier=False, med_barrier=False):
    from server_spark.barrier import barrier
    from server_spark.parity import r4
    from server_spark.sources.synthetic import auctions as _auctions

    _T30_CUT = 3.5
    priced = (
        _auctions(spark, sf_dir)
        .filter(F.col("buyout") > 0)
        .select("auc", "item", "buyout")
    )
    w = Window.partitionBy("item")

    def mids(rn, n):
        return (rn == F.floor((n + 1) / 2)) | (rn == F.floor((n + 2) / 2))

    r1 = priced.select(
        "auc", "item", "buyout",
        F.row_number().over(w.orderBy("buyout")).alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    med = (
        r1.filter(mids(F.col("rn"), F.col("n")))
        .groupBy("item")
        .agg(F.avg("buyout").alias("med"))
    )
    if med_barrier:
        med = med.transform(barrier)
    dev = r1.select("auc", "item", "buyout").join(med, "item").withColumn(
        "d", F.abs(F.col("buyout") - F.col("med"))
    )
    if dev_barrier:
        dev = dev.transform(barrier)
    r2 = dev.select(
        "item", "d",
        F.row_number().over(w.orderBy("d")).alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    mad = (
        r2.filter(mids(F.col("rn"), F.col("n")))
        .groupBy("item")
        .agg(F.avg("d").alias("mad"))
    )
    z = r4(0.6745 * (F.col("buyout") - F.col("med")) / F.col("mad"))
    return (
        dev.join(mad, "item")
        .filter((F.col("mad") > 0) & (F.abs(z) > _T30_CUT))
        .select(
            "auc", "item", "buyout",
            r4(F.col("med")).alias("median_buyout"),
            r4(F.col("mad")).alias("mad"),
            z.alias("robust_z"),
        )
        .orderBy("item", "auc")
    )


def a43(spark, sf_dir, gated_barrier=False, deg_barrier=False):
    from server_spark.barrier import barrier
    from server_spark.parity import r4
    from server_spark.queries.ext_analytics import (
        _A43_MAX_DEG,
        _A43_MICRO,
        _A43_MIN_DEG,
        _A43_TOPK,
    )
    from server_spark.sources.synthetic import auctions

    au = auctions(spark, sf_dir)
    io = au.select("item", "owner").distinct().transform(barrier)
    deg = (
        io.groupBy("item")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n").between(_A43_MIN_DEG, _A43_MAX_DEG))
    )
    if deg_barrier:
        deg = deg.transform(barrier)
    gated = io.join(deg, "item")
    if gated_barrier:
        gated = gated.transform(barrier)
    b = gated.select("item", F.col("owner").alias("owner_b"))
    w = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _A43_MICRO.items() for x in kv]
        ),
        F.col("n").cast("integer"),
    )
    pairs = (
        gated.select("item", F.col("owner").alias("owner_a"), w.alias("w"))
        .join(b, "item")
        .filter(F.col("owner_a") < F.col("owner_b"))
    )
    return (
        pairs.groupBy("owner_a", "owner_b")
        .agg(
            F.count("*").alias("n_shared"),
            F.sum("w").alias("aa_micro"),
        )
        .select(
            "owner_a", "owner_b", "n_shared", "aa_micro",
            r4(F.col("aa_micro") / 1_000_000.0).alias("aa_score"),
        )
        .orderBy(F.col("aa_micro").desc(), "owner_a", "owner_b")
        .limit(_A43_TOPK)
    )


def a38(spark, sf_dir, fanned=False):
    from server_spark.barrier import barrier
    from server_spark.queries.joins_sets import _A38_COLS
    from server_spark.sources.synthetic import auctions

    au = auctions(spark, sf_dir, fanned=fanned)
    stack_args = ", ".join(f"'{name}', {expr}" for name, expr in _A38_COLS)
    melt = au.selectExpr(
        f"stack({len(_A38_COLS)}, {stack_args}) AS (column_name, val)"
    )
    vc = melt.groupBy("column_name", "val").agg(F.count("*").alias("c"))
    vc = vc.transform(barrier)
    stats = vc.groupBy("column_name").agg(
        F.sum("c").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("val").isNull(), F.col("c"))), F.lit(0)
        ).alias("n_null"),
        F.count(F.when(F.col("val").isNotNull(), 1)).alias("n_distinct"),
    )
    wtop = Window.partitionBy("column_name").orderBy(
        F.col("c").desc(), F.col("val").asc()
    )
    top = (
        vc.filter(F.col("val").isNotNull())
        .select(
            "column_name", "val", "c",
            F.row_number().over(wtop).alias("rn"),
        )
        .filter(F.col("rn") == 1)
    )
    return (
        stats.join(top, "column_name")
        .select(
            "column_name", "n", "n_null", "n_distinct",
            F.col("val").alias("top_value"),
            F.col("c").alias("top_freq"),
        )
        .orderBy("column_name")
    )


def a41(spark, sf_dir, fanned=False, fact_barrier=True):
    from server_spark.barrier import barrier
    from server_spark.parity import r4
    from server_spark import tables
    from server_spark.queries.ext_analytics import _A41_BLOCKS, _A41_CUTS
    from server_spark.sources.synthetic import auctions

    au = auctions(spark, sf_dir, fanned=fanned)
    sup = tables.load(spark, sf_dir, "supplier")
    nat = tables.load(spark, sf_dir, "nation")
    reg = tables.load(spark, sf_dir, "region")
    cents = (F.col("buyout").cast("decimal(18,2)") * 100).cast("bigint")
    fact = (
        au.join(sup, au.owner == sup.s_suppkey)
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .select(
            "auc", cents.alias("cents"), F.col("r_name").alias("region_name")
        )
    )
    if fact_barrier:
        fact = fact.transform(barrier)
    nshuf = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    hx = fact.repartition(nshuf).select(
        "region_name", "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_A41_BLOCKS - 1))).alias("blk"),
        "auc",
    ).select(
        "region_name", "cents", "blk",
        F.md5(
            F.concat_ws("|", F.col("auc"), F.col("blk").cast("string"))
        ).alias("hex"),
    )
    vs = hx.select(
        "region_name", "cents", "blk",
        F.conv(F.substring("hex", 1, 15), 16, 10).cast("long").alias("v1"),
        F.conv(F.substring("hex", 16, 15), 16, 10).cast("long").alias("v2"),
    )
    draws = vs.select(
        "region_name", "cents", "v1", "v2", "blk",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("j"),
    ).select(
        "region_name", "cents",
        (F.col("blk") * 8 + F.col("j")).alias("rep"),
        F.expr(
            "shiftright(CASE WHEN j < 4 THEN v1 ELSE v2 END, (j % 4) * 15)"
            " & 32767"
        ).alias("k"),
    )
    wgt = F.lit(0)
    for cut in _A41_CUTS:
        wgt = wgt + (F.col("k") >= cut).cast("long")
    pw = (
        draws.select("region_name", "rep", "cents", wgt.alias("wgt"))
        .groupBy("region_name", "rep")
        .agg(
            F.sum("wgt").alias("wsum"),
            F.sum(F.col("wgt") * F.col("cents")).alias("csum"),
        )
    )
    means = pw.select(
        "region_name",
        (F.col("csum").cast("double") / (100.0 * F.col("wsum"))).alias("m"),
    )
    boot = means.groupBy("region_name").agg(F.stddev_samp("m").alias("se"))
    pt = fact.groupBy("region_name").agg(
        F.count("*").alias("n"),
        (F.sum("cents").cast("double") / (100.0 * F.count("*"))).alias("mu"),
    )
    mu, se = F.col("mu"), F.col("se")
    return (
        pt.join(boot, "region_name")
        .select(
            "region_name", "n",
            r4(mu).alias("mean_buyout"),
            r4(se).alias("boot_se"),
            r4(mu - 1.96 * se).alias("ci_lo"),
            r4(mu + 1.96 * se).alias("ci_hi"),
        )
        .orderBy("region_name")
    )


def x75(spark, sf_dir, hot_broadcast=False):
    from server_spark.barrier import barrier
    from server_spark.parity import r4
    from server_spark.dedup import minhash as mh
    from server_spark.dedup import ngram as ng
    from server_spark.queries.ext_common import _docs, fan_out
    from server_spark.queries.ext_dedup import (
        _X75_BUCKET_CAP,
        _X75_MIN_CONTAIN,
        _X75_MIN_SH,
    )

    arrs = fan_out(_docs(spark, sf_dir)).select(
        "doc_id", ng.split_words("text").alias("_words")
    ).select(
        "doc_id", ng.shingle_array("_words", 3).alias("_sh")
    ).transform(barrier)
    shingles = arrs.select(
        "doc_id",
        F.size("_sh").alias("n"),
        F.explode("_sh").alias("shingle"),
    )

    plist = shingles.groupBy("shingle").agg(F.count("*").alias("pl"))
    if hot_broadcast:
        hot = plist.filter(F.col("pl") > _X75_BUCKET_CAP).select(
            "shingle"
        ).transform(barrier)
        cold = shingles.join(F.broadcast(hot), "shingle", "left_anti")
        hotp = shingles.join(F.broadcast(hot), "shingle", "left_semi").select(
            "doc_id", "shingle"
        )
    else:
        tagged = shingles.join(plist, "shingle").transform(barrier)
        cold = tagged.filter(F.col("pl") <= _X75_BUCKET_CAP)
        hotp = tagged.filter(F.col("pl") > _X75_BUCKET_CAP).select(
            "doc_id", "shingle"
        )

    pc = mh.bucket_pairs(
        cold.select("doc_id", "n", "shingle"),
        ["shingle"],
        payload=("n",),
        count_col="n_cold",
    ).withColumnsRenamed(
        {"doc_a": "doc_sub", "doc_b": "doc_super",
         "n_a": "n_sub", "n_b": "n_sup"}
    ).transform(barrier)
    ha = hotp.select(F.col("doc_id").alias("doc_sub"), "shingle")
    hb = hotp.select(F.col("doc_id").alias("doc_super"), "shingle")
    ph = (
        pc.select("doc_sub", "doc_super")
        .join(ha, "doc_sub")
        .join(hb, ["doc_super", "shingle"])
        .groupBy("doc_sub", "doc_super")
        .agg(F.count("*").alias("n_hot"))
    )
    undirected = (
        pc.join(ph, ["doc_sub", "doc_super"], "left")
        .select(
            "doc_sub", "doc_super", "n_sub", "n_sup",
            (
                F.col("n_cold") + F.coalesce(F.col("n_hot"), F.lit(0))
            ).alias("n_common"),
        )
    )
    inter = undirected.unionByName(
        undirected.select(
            F.col("doc_super").alias("doc_sub"),
            F.col("doc_sub").alias("doc_super"),
            F.col("n_sup").alias("n_sub"),
            F.col("n_sub").alias("n_sup"),
            "n_common",
        )
    )
    contain = F.col("n_common").cast("double") / F.col("n_sub")
    return (
        inter.filter(
            (F.col("n_sub") >= _X75_MIN_SH)
            & (contain >= _X75_MIN_CONTAIN)
        )
        .select(
            "doc_sub", "doc_super", "n_common", "n_sub",
            r4(contain).alias("containment"),
            r4(
                F.col("n_common").cast("double")
                / (F.col("n_sub") + F.col("n_sup") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .orderBy(F.col("containment").desc(), "doc_sub", "doc_super")
    )


def a39(spark, sf_dir, fused=False):
    from server_spark import tables
    from server_spark.queries.joins_sets import _A39_ENUM
    from server_spark.sources.synthetic import auctions

    au = auctions(spark, sf_dir)
    part = tables.load(spark, sf_dir, "part")

    def rule(name, df, viol):
        return df.agg(
            F.lit(name).alias("rule"),
            F.count("*").alias("n_checked"),
            F.coalesce(F.sum(F.when(viol, 1)), F.lit(0)).alias(
                "n_violations"
            ),
        )

    ref = au.join(
        part.select(F.col("p_partkey").alias("item"), F.lit(1).alias("_hit")),
        "item",
        "left",
    )
    r1 = rule("item_ref_integrity", ref, F.col("_hit").isNull())
    if not fused:
        checks = [
            r1,
            rule("nonneg_buyout", au, F.col("buyout") < 0),
            rule("positive_quantity", au, F.col("quantity") < 1),
            rule(
                "timeleft_enum",
                au,
                F.col("time_left").isNull()
                | ~F.col("time_left").isin(*_A39_ENUM),
            ),
        ]
        uniq = au.agg(
            F.lit("unique_auc").alias("rule"),
            F.count("*").alias("n_checked"),
            (F.count("*") - F.countDistinct("auc")).alias("n_violations"),
        )
        out = checks[0]
        for c in checks[1:] + [uniq]:
            out = out.unionByName(c)
        return out.orderBy("rule")

    def v(cond):
        return F.coalesce(F.sum(F.when(cond, 1)), F.lit(0))

    one = au.agg(
        F.count("*").alias("n"),
        v(F.col("buyout") < 0).alias("v_buy"),
        v(F.col("quantity") < 1).alias("v_qty"),
        v(
            F.col("time_left").isNull()
            | ~F.col("time_left").isin(*_A39_ENUM)
        ).alias("v_enum"),
        (F.count("*") - F.countDistinct("auc")).alias("v_uniq"),
    )
    four = one.selectExpr(
        "stack(4, "
        "'nonneg_buyout', n, v_buy, "
        "'positive_quantity', n, v_qty, "
        "'timeleft_enum', n, v_enum, "
        "'unique_auc', n, v_uniq) AS (rule, n_checked, n_violations)"
    )
    return r1.unionByName(four).orderBy("rule")


VARIANTS = {
    "a39A": lambda s, d: a39(s, d),
    "a39B": lambda s, d: a39(s, d, fused=True),
    "x75A": lambda s, d: x75(s, d),
    "x75B": lambda s, d: x75(s, d, hot_broadcast=True),
    "t30A": lambda s, d: t30(s, d),
    "t30B": lambda s, d: t30(s, d, dev_barrier=True),
    "t30C": lambda s, d: t30(s, d, med_barrier=True),
    "t30D": lambda s, d: t30(s, d, dev_barrier=True, med_barrier=True),
    "a43A": lambda s, d: a43(s, d),
    "a43B": lambda s, d: a43(s, d, gated_barrier=True),
    "a43C": lambda s, d: a43(s, d, deg_barrier=True),
    "a38A": lambda s, d: a38(s, d),
    "a38B": lambda s, d: a38(s, d, fanned=True),
    "a41A": lambda s, d: a41(s, d),
    "a41B": lambda s, d: a41(s, d, fanned=True),
    "a41C": lambda s, d: a41(s, d, fanned=True, fact_barrier=False),
    "a41D": lambda s, d: a41(s, d, fact_barrier=False),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="+")
    ap.add_argument("-n", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    names = args.variants

    from server_spark.session import get_spark

    spark = get_spark("exp-misc")
    spark.sparkContext.setLogLevel("ERROR")

    def mat(df):
        df.select(F.xxhash64(*df.columns).alias("_h")).agg(
            F.count("_h"), F.expr("bit_xor(_h)")
        ).collect()

    hashes = {}
    for v in names:
        rows = VARIANTS[v](spark, args.sf).collect()
        hashes[v] = tuple(tuple(r) for r in rows)
        spark.catalog.clearCache()
    groups = {}
    for v in names:
        groups.setdefault(v[:3], []).append(v)
    for g, vs in groups.items():
        ref = hashes[vs[0]]
        for v in vs[1:]:
            assert hashes[v] == ref, f"{v} differs from {vs[0]}"
    print(f"identity check OK within groups {list(groups)}")

    times = {v: [] for v in names}
    mat(VARIANTS[names[0]](spark, args.sf))  # warmup
    order = names + names[::-1]
    for _ in range(args.n):
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
