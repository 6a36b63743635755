"""Distributed synthetic-data generator for scale-out measurement.

The driver ships fixed parquet at sf{0.001,0.01,0.1} (read-only).
Proving the 100 TB posture empirically needs a LARGER dataset with
the SAME schemas, name formats, value domains and key relationships —
this script generates any scale factor entirely Spark-side
(`spark.range` + deterministic xxhash64-derived columns: no driver
loops, no numpy materialization), so generation itself demonstrates
the distributed path and runs at any sf a disk can hold.

Distributions mirror the profiled /root/testdata tables (TESTDATA.md
+ parquet footers): TPC-H-ish star schema, events stream, documents
with planted near-duplicates, label-clustered embeddings. Row counts
scale linearly at the driver's observed sf0.1 ratios (lineitem ~6M
rows/sf, documents 50k/sf, embeddings 20k/sf).

Usage:
    python scripts/gen_scale_data.py [--sf 1.0] [--out DIR]

Default output: /root/repo/.localdata/sf{sf}g (gitignored). The 'g'
suffix marks generator data — scale probes compare sf0.1g vs sf1.0g
(same generator both sides) so the measured exponent reflects engine
scaling, not generator-vs-driver distribution drift.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

# Vocab sets lifted from the sf0.1 profile so filter/substring/fuzzy
# queries see the same value domains on generated data.
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["zh", "es", "fr", "de"]  # en gets ~41% separately
DOC_WORDS = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]


def _u(col, salt: int):
    """Deterministic uniform [0,1) from a column + salt (JVM-side)."""
    return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(1 << 20)) / float(1 << 20)


def _pick(col, salt: int, values: list[str]):
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(
        arr, (F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(len(values))) + 1).cast("int")
    )


def _mod(col, salt: int, n: int):
    return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(n))


def gen_all(spark: SparkSession, sf: float, out: str) -> None:
    n_cust = max(int(150_000 * sf), 10)
    n_supp = max(int(10_000 * sf), 5)
    n_part = max(int(200_000 * sf), 20)
    n_orders = max(int(1_500_000 * sf), 100)
    n_events = max(int(1_000_000 * sf), 100)
    n_users = max(int(15_000 * sf), 10)
    n_docs = max(int(50_000 * sf), 50)
    n_emb = max(int(20_000 * sf), 50)
    parts = max(4, min(64, int(32 * max(sf, 0.05))))
    os.makedirs(out, exist_ok=True)

    def w(df: DataFrame, name: str, n_files: int = None) -> None:
        df.repartition(n_files or parts).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )

    # region/nation are fixed dimension tables: copy from the driver's
    # sf0.1 (they do not scale with sf by design).
    src = "/root/testdata/sf0.1"
    w(spark.read.parquet(f"{src}/region.parquet"), "region", 1)
    w(spark.read.parquet(f"{src}/nation.parquet"), "nation", 1)

    cust = (
        spark.range(n_cust)
        .select(
            F.col("id").alias("c_custkey"),
            F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
            _mod(F.col("id"), 11, 25).cast("int").alias("c_nationkey"),
            F.round(-1000.0 + _u(F.col("id"), 12) * 11000.0, 2).alias("c_acctbal"),
            _pick(F.col("id"), 13, SEGS).alias("c_mktsegment"),
        )
    )
    w(cust, "customer", max(1, parts // 8))

    supp = (
        spark.range(n_supp)
        .select(
            F.col("id").alias("s_suppkey"),
            F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
            _mod(F.col("id"), 21, 25).cast("int").alias("s_nationkey"),
            F.round(-1000.0 + _u(F.col("id"), 22) * 11000.0, 2).alias("s_acctbal"),
        )
    )
    w(supp, "supplier", 1)

    part = (
        spark.range(n_part)
        .select(
            F.col("id").alias("p_partkey"),
            F.concat_ws(
                " ", _pick(F.col("id"), 31, ADJS), _pick(F.col("id"), 32, NOUNS)
            ).alias("p_name"),
            F.format_string(
                "Brand#%d", (_mod(F.col("id"), 33, 25) + 1).cast("int")
            ).alias("p_brand"),
            _pick(F.col("id"), 34, TYPES).alias("p_type"),
            (_mod(F.col("id"), 35, 50) + 1).cast("int").alias("p_size"),
            F.round(900.0 + _u(F.col("id"), 36) * 99.9, 2).alias("p_retailprice"),
        )
    )
    w(part, "part", max(1, parts // 8))

    base_1995 = F.lit("1995-01-01").cast("timestamp")
    orders = (
        spark.range(n_orders)
        .select(
            F.col("id").alias("o_orderkey"),
            _mod(F.col("id"), 41, n_cust).alias("o_custkey"),
            _pick(F.col("id"), 42, ["O", "F", "P"]).alias("o_orderstatus"),
            F.round(1000.0 + _u(F.col("id"), 43) * 499000.0, 2).alias("o_totalprice"),
            F.timestamp_seconds(
                F.unix_timestamp(base_1995)
                + _mod(F.col("id"), 44, 2404) * 86400
            ).cast("timestamp_ntz").alias("o_orderdate"),
            _pick(F.col("id"), 45, PRIOS).alias("o_orderpriority"),
        )
    )
    w(orders, "orders")

    # lineitem: 1-7 lines per order (avg 4 → ~6M rows/sf), built by
    # exploding a per-order sequence — the only scalable join-free way
    # to get the real orderkey→lines multiplicity.
    li_base = orders.select(
        "o_orderkey",
        "o_orderdate",
        F.explode(
            F.sequence(F.lit(1), (_mod(F.col("o_orderkey"), 51, 7) + 1).cast("int"))
        ).alias("l_linenumber"),
    )
    lk = F.xxhash64("o_orderkey", "l_linenumber", F.lit(52))
    lineitem = li_base.select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.pmod(lk, F.lit(n_part)).alias("l_partkey"),
        F.pmod(F.xxhash64("o_orderkey", "l_linenumber", F.lit(53)), F.lit(n_supp)).alias(
            "l_suppkey"
        ),
        F.col("l_linenumber"),
        (F.floor(_u(lk, 54) * 50) + 1).cast("double").alias("l_quantity"),
        F.round(900.0 + _u(lk, 55) * 104100.0, 2).alias("l_extendedprice"),
        F.round(F.floor(_u(lk, 56) * 11) / 100.0, 2).alias("l_discount"),
        F.round(F.floor(_u(lk, 57) * 9) / 100.0, 2).alias("l_tax"),
        _pick(lk, 58, ["A", "N", "R"]).alias("l_returnflag"),
        _pick(lk, 59, ["O", "F"]).alias("l_linestatus"),
        F.timestamp_seconds(
            F.unix_timestamp(
                F.col("o_orderdate").cast("timestamp")
            ) + (F.pmod(lk, F.lit(120)) + 1) * 86400
        ).cast("timestamp_ntz").alias("l_shipdate"),
    )
    w(lineitem, "lineitem")

    base_2024 = F.lit("2024-01-01").cast("timestamp")
    ev = F.col("id")
    events = (
        spark.range(n_events)
        .select(
            ev.alias("event_id"),
            F.timestamp_micros(
                (
                    F.unix_timestamp(base_2024) * 1_000_000
                    + (_u(ev, 61) * 30.0 * 86400.0 * 1e6).cast("long")
                )
            ).cast("timestamp_ntz").alias("ts"),
            _mod(ev, 62, n_users).alias("user_id"),
            _pick(ev, 63, EVENT_TYPES).alias("event_type"),
            F.round(
                F.least(-F.log(F.lit(1.0) - _u(ev, 64) + 1e-9) * 50.0, F.lit(600.0)),
                2,
            ).alias("value"),
            F.format_string(
                '{"k": %d}', _mod(ev, 65, 100).cast("int")
            ).alias("props"),
        )
    )
    w(events, "events")

    # documents: 10-100 words from the 31-word vocab; ~5% of rows are
    # NEAR-DUPLICATES of an earlier doc (same word seed, one word
    # mutated) so minhash/simhash/component pipelines find real edges
    # at every sf, like the driver data's planted dups.
    words_arr = F.array(*[F.lit(wd) for wd in DOC_WORDS])
    did = F.col("id")
    is_dup = (_mod(did, 71, 20) == 0) & (did >= 100)
    seed_id = F.when(is_dup, did - (_mod(did, 72, 97) + 1)).otherwise(did)
    length = (_mod(seed_id, 73, 91) + 10).cast("int")
    body = F.transform(
        F.sequence(F.lit(1), length),
        lambda i: F.element_at(
            words_arr,
            (F.pmod(F.xxhash64(seed_id, i, F.lit(74)), F.lit(len(DOC_WORDS))) + 1).cast(
                "int"
            ),
        ),
    )
    # mutate word #1 on dup rows → near (not exact) duplicates
    body = F.when(
        is_dup,
        F.concat(F.array(F.lit("dup")), F.slice(body, 2, 1_000_000)),
    ).otherwise(body)
    text = F.array_join(body, " ")
    docs = spark.range(n_docs).select(
        did.alias("doc_id"),
        text.alias("text"),
        F.when(_u(did, 75) < 0.41, F.lit("en"))
        .otherwise(_pick(did, 76, LANGS))
        .alias("lang"),
        F.format_string("src%d", _mod(did, 77, 20).cast("int")).alias("source"),
        F.length(text).alias("n_chars"),
    )
    w(docs, "documents", max(1, parts // 4))

    # embeddings: 64-dim float vectors with mild label-centered
    # clusters (center = 0.3*sin(label*17+d), noise U(-0.4,0.4)) so
    # IVF/semantic-dedup paths have real cluster structure.
    vid = F.col("id")
    label = _mod(vid, 81, 10).cast("int")
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda d: (
            F.sin((label.cast("double") * 17.0 + d.cast("double")) * 1.7) * 0.3
            + (
                F.pmod(F.xxhash64(vid, d, F.lit(82)), F.lit(1000)) / 1000.0
                - 0.5
            )
            * 0.8
        ).cast("float"),
    )
    embeddings = spark.range(n_emb).select(
        vid.alias("vec_id"), emb.alias("embedding"), label.alias("label")
    )
    w(embeddings, "embeddings", max(1, parts // 4))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or f"/root/repo/.localdata/sf{args.sf:g}g"

    from server_spark.session import get_spark

    spark = get_spark("gen-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    # match the driver data's physical type (NAIVE timestamp[us],
    # read back as TimestampNTZType): Spark's default INT96 breaks
    # readers that pin an INT64-backed schema, and adjusted-to-UTC
    # micros surface as TIMESTAMPTZ in the DuckDB oracle
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    gen_all(spark, args.sf, out)
    for t in ["lineitem", "orders", "events", "documents", "embeddings"]:
        n = spark.read.parquet(os.path.join(out, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")
    print(f"written: {out}")


if __name__ == "__main__":
    main()
