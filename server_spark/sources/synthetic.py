"""Adapters from the driver's synthetic TPC-H-ish tables onto the
reference's domain shapes (FIXTURES.md §3 mapping).

The reference's fact relation is the raw auction row
(`app/pkg/blizzard/auction.go` [M]); the harness stand-in is
``lineitem``. The mapping lives HERE ONCE, in two dialect-identical
forms — a DataFrame projection and a SQL CTE — so every query and its
DuckDB oracle see the exact same relation:

    auc       := md5 row id (see below)            (unique row id)
    item      := l_partkey
    owner     := l_suppkey
    buyout    := l_extendedprice
    quantity  := l_quantity
    time_left := l_returnflag   (small string enum, like VERY_LONG…)
    dump_ts   := l_shipdate     (snapshot timestamp analog)

The synthetic lineitem has NO unique natural key — (l_orderkey,
l_linenumber) repeats (11785 duplicate pairs at sf0.01), so the
obvious ``orderkey*10+linenumber`` id silently collides. ``auc`` is
therefore an md5 over (orderkey, linenumber, partkey, suppkey,
price-cents), verified unique at every sf. Price cents go through a
DECIMAL(18,2) snap before the integer cast because Spark truncates
double→bigint while DuckDB rounds (parity.py §rounding); every md5
input is integer-or-string typed so both engines render identical
concat strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server_spark import tables

# SQL form of the same projection, for DuckDB oracle CTEs.
AUCTIONS_SQL_CTE = """
auctions AS (
    SELECT
        md5(concat_ws('|',
            l_orderkey, l_linenumber, l_partkey, l_suppkey,
            CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        ))                             AS auc,
        l_partkey                      AS item,
        l_suppkey                      AS owner,
        l_extendedprice                AS buyout,
        l_quantity                     AS quantity,
        l_returnflag                   AS time_left,
        l_shipdate                     AS dump_ts
    FROM lineitem
)
"""


def auctions(
    spark: SparkSession, sf_dir: str, fanned: bool = False
) -> DataFrame:
    """Load ``lineitem`` projected into the canonical auction shape.

    ``fanned=True`` fan_outs the raw scan UNDER the md5 projection
    (r14, tables.fan_out, keyed on the order/line id so narrow
    consumers stay pruned): heavy consumers (a1's collect_list over
    the md5 row-ids) otherwise run the id hashing and their map-side
    partial agg on however few cores the scan planned. OPT-IN because
    the exchange is pure tax for the many sub-second scans/filters
    over this relation (measured +0.2-1.4 s on p2/a4/a5-class
    queries vs −2.7 s on a1).
    """
    li = tables.load(spark, sf_dir, "lineitem")
    if fanned:
        li = tables.fan_out(li, "l_orderkey", "l_linenumber")
    cents = (
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
    )
    row_id = F.md5(
        F.concat_ws(
            "|",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.col("l_partkey").cast("string"),
            F.col("l_suppkey").cast("string"),
            cents.cast("string"),
        )
    )
    return li.select(
        row_id.alias("auc"),
        F.col("l_partkey").alias("item"),
        F.col("l_suppkey").alias("owner"),
        F.col("l_extendedprice").alias("buyout"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_returnflag").alias("time_left"),
        F.col("l_shipdate").alias("dump_ts"),
    )
