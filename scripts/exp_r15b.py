"""Interleaved A/B harness for the round-15 continuation batch:

- t53: union-of-two-projections event build vs single-pass explode
- x42: corpus tokenize+hash relation barriered vs re-planned per side
- a24: owner_vol aggregation barriered vs re-planned per consumer
- a35: serial wide global ranks vs narrow parallel ranks + join-back
- ccE: connected_components edge barrier eager vs lazy (via x15)

Variants are output-identical (asserted before timing); pairs run
round-robin A/B..B/A in one session with cache clears.

Usage: python scripts/exp_r15b.py [-n 4] [--sf DIR] t53A t53B ...
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


def t53(spark, sf_dir, exploded=False):
    from pyspark.sql import Window as W

    from server_spark.parity import r4
    from server_spark.queries.joins_sets import _T53_HOURS
    from server_spark.sources.synthetic import auctions as _auc

    au = _auc(spark, sf_dir)
    dur = (
        F.when(F.col("time_left") == "A", _T53_HOURS["A"])
        .when(F.col("time_left") == "N", _T53_HOURS["N"])
        .otherwise(_T53_HOURS["R"])
    )
    iv = au.select(
        "auc",
        "item",
        F.col("dump_ts").alias("t0"),
        (F.col("dump_ts") + dur * F.expr("INTERVAL 1 HOUR")).alias("t1"),
    )
    if exploded:
        ev = iv.select(
            "item",
            "auc",
            F.explode(
                F.array(
                    F.struct(
                        F.col("t0").alias("ts"), F.lit(1).alias("delta")
                    ),
                    F.struct(
                        F.col("t1").alias("ts"), F.lit(-1).alias("delta")
                    ),
                )
            ).alias("e"),
        ).select("item", F.col("e.ts").alias("ts"), F.col("e.delta").alias("delta"), "auc")
    else:
        ev = iv.select(
            "item", F.col("t0").alias("ts"), F.lit(1).alias("delta"), "auc"
        ).unionByName(
            iv.select(
                "item", F.col("t1").alias("ts"), F.lit(-1).alias("delta"),
                "auc",
            )
        )
    w = (
        W.partitionBy("item")
        .orderBy("ts", "delta", "auc")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    run = ev.select(
        "item", "ts", F.sum("delta").over(w).alias("live")
    ).select(
        "item", "ts", "live",
        F.max("live").over(W.partitionBy("item")).alias("max_concurrent"),
    )
    peaks = (
        run.filter(F.col("live") == F.col("max_concurrent"))
        .groupBy("item", "max_concurrent")
        .agg(F.min("ts").alias("first_peak_ts"))
    )
    return (
        peaks.select(
            "item",
            F.col("max_concurrent").cast("bigint").alias("max_concurrent"),
            "first_peak_ts",
            F.count("*").over(
                W.partitionBy(F.lit(1))
            ).cast("bigint").alias("n_items"),
        )
        .orderBy(F.col("max_concurrent").desc(), "item")
        .limit(50)
    )


def x42(spark, sf_dir, cut=False):
    from server_spark.barrier import lazy_barrier
    from server_spark.similarity import cosine as cos
    from server_spark.dedup import exact as ex
    from server_spark.dedup import ngram as ng
    from server_spark.parity import r4
    from server_spark.queries.ext_common import _docs, _emb
    from server_spark.queries.ext_similarity import JACCARD_MIN, NEARDUP_COS

    pairs = cos.neardup_pairs_blocked(
        _emb(spark, sf_dir), threshold=NEARDUP_COS
    ).select(
        F.col("vec_a").alias("doc_a"),
        F.col("vec_b").alias("doc_b"),
        F.col("score").alias("cos_score"),
    )
    words = _docs(spark, sf_dir).select(
        "doc_id", ng.split_words("text").alias("w"), ex.text_hash("text").alias("h")
    )
    sets = words.select(
        "doc_id", ng.shingle_array("w").alias("sh_set"), "h"
    ).withColumn("n_sh", F.size("sh_set"))
    if cut:
        sets = sets.transform(lazy_barrier)
    a = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh_set").alias("set_a"),
        F.col("n_sh").alias("sh_a"),
        F.col("h").alias("h_a"),
    )
    b = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh_set").alias("set_b"),
        F.col("n_sh").alias("sh_b"),
        F.col("h").alias("h_b"),
    )
    j = pairs.join(a, "doc_a").join(b, "doc_b").withColumn(
        "n_common", F.size(F.array_intersect("set_a", "set_b"))
    )
    jac_exact = F.try_divide(
        F.col("n_common"),
        F.col("sh_a") + F.col("sh_b") - F.col("n_common"),
    )
    return j.select(
        "doc_a", "doc_b", "cos_score", "n_common",
        r4(jac_exact).alias("jaccard"),
        (F.col("h_a") == F.col("h_b")).alias("is_exact"),
        (
            (F.col("h_a") == F.col("h_b"))
            | F.coalesce(jac_exact >= F.lit(JACCARD_MIN), F.lit(False))
        ).alias("confirmed"),
    )


def a24(spark, sf_dir, cut=False):
    from server_spark.barrier import lazy_barrier
    from server_spark.parity import r4
    from server_spark.queries.joins_sets import _A24_MIN_LISTINGS
    from server_spark.sources.synthetic import auctions

    owner_vol = (
        auctions(spark, sf_dir)
        .groupBy("item", "owner")
        .agg(F.sum("quantity").alias("q"))
    )
    if cut:
        owner_vol = owner_vol.transform(lazy_barrier)
    item_tot = owner_vol.groupBy("item").agg(
        F.sum("q").alias("tot"), F.count("*").alias("n_owners")
    )
    share = F.col("q") * 1.0 / F.col("tot")
    return (
        owner_vol.join(item_tot, "item")
        .filter(F.col("tot") >= _A24_MIN_LISTINGS)
        .groupBy("item", "n_owners")
        .agg(
            r4(F.sum(share * share)).alias("hhi"),
            r4(F.max("q") * 1.0 / F.any_value("tot")).alias(
                "top_owner_share"
            ),
        )
        .orderBy(F.col("hhi").desc(), "item")
    )


def a35(spark, sf_dir, narrow=False):
    from server_spark.barrier import lazy_barrier
    from server_spark.operators.ranking import global_row_number
    from server_spark.parity import r4
    from server_spark import tables
    from server_spark.queries.joins_sets import _A35_ANCHOR

    orders = tables.load(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit(_A35_ANCHOR).cast("date"), F.max("o_orderdate").cast("date")
        ).alias("recency_days"),
        F.count("*").alias("frequency"),
        F.sum(cents).alias("monetary_cents"),
    ).transform(lazy_barrier)
    n = cust.agg(F.count("*").alias("n"))
    if narrow:
        rr = global_row_number(
            cust.select("custkey", "recency_days"),
            [F.col("recency_days").desc(), F.col("custkey")], "r_rn",
        ).select("custkey", "r_rn")
        ff = global_row_number(
            cust.select("custkey", "frequency"),
            [F.col("frequency"), F.col("custkey")], "f_rn",
        ).select("custkey", "f_rn")
        mm = global_row_number(
            cust.select("custkey", "monetary_cents"),
            [F.col("monetary_cents"), F.col("custkey")], "m_rn",
        ).select("custkey", "m_rn")
        ranked = (
            cust.crossJoin(F.broadcast(n))
            .join(rr, "custkey").join(ff, "custkey").join(mm, "custkey")
        )
    else:
        ranked = cust.crossJoin(F.broadcast(n))
        ranked = global_row_number(
            ranked, [F.col("recency_days").desc(), F.col("custkey")], "r_rn"
        )
        ranked = global_row_number(
            ranked, [F.col("frequency"), F.col("custkey")], "f_rn"
        )
        ranked = global_row_number(
            ranked, [F.col("monetary_cents"), F.col("custkey")], "m_rn"
        )

    def score(rn: str) -> F.Column:
        return F.expr(f"({rn} - 1) * 5 DIV n + 1").cast("int")

    scored = ranked.select(
        "custkey", "recency_days", "frequency", "monetary_cents",
        score("r_rn").alias("r_score"),
        score("f_rn").alias("f_score"),
        score("m_rn").alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4)
            & (F.col("m_score") >= 4),
            "champion",
        )
        .when(F.col("f_score") >= 4, "loyal")
        .when(F.col("m_score") >= 4, "big_spender")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 3), "at_risk")
        .when(F.col("r_score") <= 2, "hibernating")
        .otherwise("other")
    )
    return scored.select(
        "custkey", "recency_days", "frequency",
        r4(F.col("monetary_cents") / 100.0).alias("monetary_gold"),
        "r_score", "f_score", "m_score", seg.alias("segment"),
    ).orderBy("custkey")


def ccE(spark, sf_dir, lazy_edges=False):
    """x15 body with the CC edge barrier eager (A) vs lazy (B)."""
    from server_spark.barrier import barrier
    from server_spark.queries.ext_dedup import _docs, _gated_edges

    edges = _gated_edges(_docs(spark, sf_dir))
    e = edges.select(
        F.col("doc_a").alias("node"), F.col("doc_b").alias("nbr")
    )
    e = barrier(e, eager=not lazy_edges)
    sym = e.unionAll(
        e.select(F.col("nbr").alias("node"), F.col("node").alias("nbr"))
    )
    labels = barrier(
        sym.groupBy("node")
        .agg(F.min("nbr").alias("_mn"))
        .select("node", F.least("node", "_mn").alias("component")),
        eager=False,
    )
    for _ in range(20):
        msgs = (
            sym.select(F.col("node").alias("n"), "nbr")
            .join(
                labels.select(F.col("node").alias("_ln"), "component"),
                F.col("nbr") == F.col("_ln"),
            )
            .select(
                F.col("n").alias("node"), "component",
                F.lit(False).alias("_self"),
            )
        )
        new_labels = (
            labels.select("node", "component", F.lit(True).alias("_self"))
            .unionAll(msgs)
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.min(F.when(F.col("_self"), F.col("component"))).alias("_old"),
            )
            .select(
                "node", "component",
                (F.col("component") < F.col("_old")).alias("_chg"),
            )
        )
        new_labels = barrier(new_labels, eager=False)
        changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    comp = labels
    return comp.groupBy("component").agg(
        F.min("node").alias("canonical_doc_id"),
        F.count("*").alias("n_members"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("node")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("member_ids"),
    ).select(
        "canonical_doc_id", "n_members", "member_ids"
    ).orderBy("canonical_doc_id")


def t44(spark, sf_dir, fold=False):
    from server_spark import tables
    from server_spark.barrier import lazy_barrier
    from server_spark.parity import r4
    from server_spark.queries.timeseries import _T44_SQUARINGS

    ev = tables.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.col("event_type").alias("s"),
        F.lead("event_type").over(w).alias("t"),
    ).filter(F.col("t").isNotNull())
    counts = steps.groupBy("s", "t").agg(F.count("*").alias("c"))
    p = counts.select(
        "s", "t",
        (F.col("c") * 1.0 / F.sum("c").over(Window.partitionBy("s"))).alias("p"),
    )
    if not fold:
        p = p.transform(lazy_barrier)
        for _ in range(_T44_SQUARINGS):
            a = p.select(F.col("s"), F.col("t").alias("mid"), F.col("p").alias("pa"))
            b = p.select(F.col("s").alias("mid"), F.col("t"), F.col("p").alias("pb"))
            p = (
                a.join(b, "mid").groupBy("s", "t")
                .agg(F.sum(F.col("pa") * F.col("pb")).alias("p"))
            ).transform(lazy_barrier)
        ns = p.agg(F.countDistinct("s").alias("n"))
        vfinal = (
            p.crossJoin(F.broadcast(ns))
            .groupBy(F.col("t").alias("state"), F.col("n"))
            .agg(F.sum(F.col("p") / F.col("n")).alias("pi"))
            .drop("n")
        )
    else:
        one = (
            p.agg(
                F.sort_array(F.collect_set("s")).alias("ss"),
                F.sort_array(F.collect_list(F.struct("s", "t", "p"))).alias("cells"),
            )
            .select(
                "ss", "cells",
                F.array_sort(
                    F.array_distinct(
                        F.concat(F.col("ss"), F.expr("transform(cells, c -> c.t)"))
                    )
                ).alias("st"),
            )
            .select("ss", "cells", "st", F.size("st").alias("k"))
            .select(
                "ss", "st", "k",
                F.expr(
                    """
                    CASE WHEN k = 0 THEN CAST(array() AS ARRAY<DOUBLE>) ELSE
                    transform(sequence(0, k * k - 1), i ->
                      aggregate(
                        filter(cells, c ->
                          c.s = element_at(st, CAST(i DIV k AS INT) + 1)
                          AND c.t = element_at(st, CAST(i % k AS INT) + 1)),
                        0D, (a, c) -> a + c.p))
                    END
                    """
                ).alias("m0"),
            )
            .select(
                "ss", "st", "k",
                F.expr(
                    f"""
                    CASE WHEN k = 0 THEN m0 ELSE
                    aggregate(sequence(1, {_T44_SQUARINGS}), m0, (acc, step) ->
                      transform(sequence(0, k * k - 1), i ->
                        aggregate(sequence(0, k - 1), 0D, (a, mm) ->
                          a + element_at(acc,
                                CAST(i DIV k AS INT) * k + CAST(mm AS INT) + 1)
                            * element_at(acc,
                                CAST(mm AS INT) * k + CAST(i % k AS INT) + 1))))
                    END
                    """
                ).alias("mf"),
            )
        )
        vfinal = one.select(
            F.explode(
                F.expr(
                    """
                    CASE WHEN k = 0 THEN
                      CAST(array() AS ARRAY<STRUCT<state: STRING, pi: DOUBLE>>)
                    ELSE
                    filter(
                      transform(sequence(0, k - 1), j ->
                        struct(
                          element_at(st, CAST(j AS INT) + 1) AS state,
                          aggregate(sequence(0, k - 1), 0D, (a, i) ->
                            a + element_at(mf,
                                  CAST(i AS INT) * k + CAST(j AS INT) + 1)
                              / size(ss)) AS pi)),
                      x -> x.pi > 0D)
                    END
                    """
                )
            ).alias("v")
        ).select(F.col("v.state").alias("state"), F.col("v.pi").alias("pi"))
    tot = ev.agg(F.count("*").alias("total"))
    emp = (
        ev.groupBy(F.col("event_type").alias("state"))
        .agg(F.count("*").alias("c"))
        .crossJoin(F.broadcast(tot))
        .select("state", (F.col("c") * 1.0 / F.col("total")).alias("share"))
    )
    return (
        vfinal.join(emp, "state")
        .select(
            "state",
            r4("pi").alias("stationary_prob"),
            r4("share").alias("empirical_share"),
        )
        .orderBy("state")
    )


VARIANTS = {
    "t44A": lambda s, d: t44(s, d),
    "t44B": lambda s, d: t44(s, d, fold=True),
    "t53A": lambda s, d: t53(s, d),
    "t53B": lambda s, d: t53(s, d, exploded=True),
    "x42A": lambda s, d: x42(s, d),
    "x42B": lambda s, d: x42(s, d, cut=True),
    "a24A": lambda s, d: a24(s, d),
    "a24B": lambda s, d: a24(s, d, cut=True),
    "a35A": lambda s, d: a35(s, d),
    "a35B": lambda s, d: a35(s, d, narrow=True),
    "ccEA": lambda s, d: ccE(s, d),
    "ccEB": lambda s, d: ccE(s, d, lazy_edges=True),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="+")
    ap.add_argument("-n", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    names = args.variants

    from server_spark.session import get_spark

    spark = get_spark("exp-r15b")
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
            if g in ("t53", "a24", "a35", "ccE"):
                assert hashes[v] == ref, f"{v} differs from {vs[0]}"
            else:  # unordered output: compare as multisets
                assert sorted(hashes[v]) == sorted(ref), f"{v} != {vs[0]}"
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
