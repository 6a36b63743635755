"""Nested-data and native-window queries (SURVEY.md §2.3 J2 explode
form, §2.9 T4 native, §2.2 P6, §2.8 F5).

The reference's region→realm hierarchy is nested JSON (region doc
contains a realm array — `app/pkg/blizzard/status.go` [M]); J2's real
shape is therefore an ArrayType explode, not just a dimension join.
Here the nested structure is built from the flat dims (collect_list)
and exploded back — exercising both directions of the nesting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server_spark import tables
from server_spark.parity import r4, r4sql
from server_spark.registry import auctions_sql, register


@register(
    "j2b_nested_explode",
    """
    WITH nested AS (
        SELECT r_name,
               list_sort(list(n_name)) AS nations
        FROM region JOIN nation ON n_regionkey = r_regionkey
        GROUP BY r_name
    )
    SELECT r_name AS region_name,
           UNNEST(nations) AS nation_name,
           len(nations) AS n_siblings
    FROM nested
    """,
    doc="J2 — nested hierarchy explode: build the region→realms array "
    "(collect_list) and flatten it back (explode), the status-document "
    "shape of the reference.",
    tags=("join", "nested"),
)
def j2b_nested_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = tables.load(spark, sf_dir, "region")
    nation = tables.load(spark, sf_dir, "nation")
    nested = (
        region.join(F.broadcast(nation), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_sort(F.collect_list("n_name")).alias("nations"))
    )
    return nested.select(
        F.col("r_name").alias("region_name"),
        F.explode("nations").alias("nation_name"),
        F.size("nations").alias("n_siblings"),
    )


@register(
    "t4b_native_session_window",
    f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               -- >= : session_window merges only gaps STRICTLY inside
               -- the 30-min horizon (window end is exclusive), so an
               -- exactly-30:00 gap starts a new session on both sides
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
                    OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               -- same (ts, event_id) tiebreak as the flag pass: with
               -- ts-only ordering a tied-timestamp pair could place
               -- the flag-0 row before its flag-1 twin and attach it
               -- to the previous session (r11 review finding)
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc="T4 — Spark's NATIVE session_window (30-min gap) in batch "
    "mode; oracle is the gaps-and-islands equivalent with the same "
    "exclusive-end merge rule (gap >= 30min splits on both engines).",
    tags=("window", "session"),
)
def t4b_native_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
        )
    )


@register(
    "p6_realm_whitelist",
    auctions_sql(
        """
        SELECT a.* FROM auctions a
        SEMI JOIN (
            SELECT s_suppkey FROM supplier WHERE s_nationkey < 5
        ) w ON a.owner = w.s_suppkey
        """
    ),
    doc="P6 — collection whitelist: only configured targets survive "
    "(broadcast left-semi join against the config set).",
    tags=("filter", "join"),
)
def p6_realm_whitelist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from server_spark.sources.synthetic import auctions

    whitelist = (
        tables.load(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 5)
        .select(F.col("s_suppkey").alias("owner"))
    )
    return auctions(spark, sf_dir).join(F.broadcast(whitelist), "owner", "left_semi")


@register(
    "f5_copper_to_gold",
    auctions_sql(
        f"""
        SELECT auc,
               CAST(FLOOR(buyout / 10000) AS BIGINT) AS gold,
               CAST(FLOOR((buyout % 10000) / 100) AS BIGINT) AS silver,
               {r4sql("buyout % 100")} AS copper
        FROM auctions
        """
    ),
    doc="F5 — copper→gold/silver/copper display units (the price "
    "formatting arithmetic; ÷10000 per gold).",
    tags=("function",),
)
def f5_copper_to_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from server_spark.sources.synthetic import auctions

    b = F.col("buyout")
    return auctions(spark, sf_dir).select(
        "auc",
        F.floor(b / 10000).cast("long").alias("gold"),
        F.floor((b % 10000) / 100).cast("long").alias("silver"),
        r4(b % 100).alias("copper"),
    )
