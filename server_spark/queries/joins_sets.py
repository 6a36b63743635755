"""Join and set-operation queries (SURVEY.md §2.3 J1–J7, §2.7 U1–U4,
§2.4 A6/A8/A9).

Snapshot-shaped queries use the ``events`` table (FIXTURES.md §3): a
"snapshot" is one UTC day of events; day-over-day active-user churn
mirrors the reference's prev-vs-next live-auction diff
(`app/pkg/state/state_liveauctions.go` intake [M]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server_spark.barrier import barrier

from server_spark import tables
from server_spark.operators import joins
from server_spark.parity import r4, r4sql
from server_spark.registry import auctions_sql, register
from server_spark.sources.synthetic import auctions

# Two adjacent "snapshots" for churn/set-op queries (events span
# 2024-01-01 .. 2024-01-30 at every sf).
DAY_A = "2024-01-10"
DAY_B = "2024-01-11"


def _day_users(spark: SparkSession, sf_dir: str, day: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.filter(F.to_date("ts") == F.lit(day).cast("date"))
        .select("user_id")
        .distinct()
    )


# ---------------------------------------------------------------------------
# J1 — dimension enrich (broadcast hash join)
# ---------------------------------------------------------------------------


@register(
    "j1_item_enrich",
    auctions_sql(
        """
        SELECT auc, item, owner, buyout, p_name AS item_name,
               p_brand AS item_brand, p_retailprice AS retail_price
        FROM auctions JOIN part ON item = p_partkey
        """
    ),
    doc="J1 — ItemsMap[itemId] lookup as a broadcast hash join of the "
    "auction fact against the item dimension.",
    tags=("join",),
)
def j1_item_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = tables.load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("item"),
        F.col("p_name").alias("item_name"),
        F.col("p_brand").alias("item_brand"),
        F.col("p_retailprice").alias("retail_price"),
    )
    return joins.enrich(
        auctions(spark, sf_dir).select("auc", "item", "owner", "buyout"), dim, "item"
    ).select(
        "auc", "item", "owner", "buyout", "item_name", "item_brand", "retail_price"
    )


# ---------------------------------------------------------------------------
# J2 — hierarchy flatten (region → nation → customer)
# ---------------------------------------------------------------------------


@register(
    "j2_region_hierarchy",
    """
    SELECT r_name AS region_name, n_name AS nation_name,
           COUNT(c_custkey) AS customer_count,
           {AB} AS total_acctbal
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY r_name, n_name
    """.format(AB=r4sql("COALESCE(SUM(c_acctbal), 0)")),
    doc="J2 — region→realm hierarchy flatten: two-level dimension join "
    "rolled up per (region, nation); both dims broadcast.",
    tags=("join",),
)
def j2_region_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = tables.load(spark, sf_dir, "region")
    nation = tables.load(spark, sf_dir, "nation")
    customer = tables.load(spark, sf_dir, "customer")
    return (
        region.join(
            F.broadcast(nation),
            nation.n_regionkey == region.r_regionkey,
        )
        .join(customer, customer.c_nationkey == nation.n_nationkey, "left")
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            F.count("c_custkey").alias("customer_count"),
            r4(F.coalesce(F.sum("c_acctbal"), F.lit(0))).alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# J3 — snapshot churn (full outer diff of adjacent days)
# ---------------------------------------------------------------------------


@register(
    "j3_snapshot_churn",
    f"""
    WITH prev AS (
        SELECT DISTINCT user_id FROM events
        WHERE CAST(ts AS DATE) = DATE '{DAY_A}'
    ),
    next AS (
        SELECT DISTINCT user_id FROM events
        WHERE CAST(ts AS DATE) = DATE '{DAY_B}'
    )
    SELECT
        COALESCE(prev.user_id, next.user_id) AS user_id,
        CASE WHEN prev.user_id IS NULL THEN 'new'
             WHEN next.user_id IS NULL THEN 'removed'
             ELSE 'persisting' END AS status
    FROM prev FULL OUTER JOIN next ON prev.user_id = next.user_id
    """,
    doc="J3 — prev-vs-next snapshot diff: one full-outer join "
    "classifying ids as new/removed/persisting (live-auctions intake "
    "churn).",
    tags=("join", "churn"),
)
def j3_snapshot_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return joins.snapshot_churn(
        _day_users(spark, sf_dir, DAY_A),
        _day_users(spark, sf_dir, DAY_B),
        "user_id",
    )


# ---------------------------------------------------------------------------
# J5 — unmet demand (anti join)
# ---------------------------------------------------------------------------


@register(
    "j5_unmet_demand",
    auctions_sql(
        """
        SELECT p_partkey AS item, p_name AS item_name
        FROM part
        ANTI JOIN (SELECT item FROM auctions WHERE owner <= 10) a
            ON p_partkey = a.item
        """
    ),
    doc="J5 — unmet demand: catalog items with zero live auctions from "
    "the first ten owners (left anti join).",
    tags=("join",),
)
def j5_unmet_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = tables.load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("item"), F.col("p_name").alias("item_name")
    )
    offered = auctions(spark, sf_dir).filter(F.col("owner") <= 10).select("item")
    return joins.unmet_demand(items, offered, "item")


# ---------------------------------------------------------------------------
# J6 — as-of alignment (history nearest-entry lookup)
# ---------------------------------------------------------------------------


@register(
    "j6_asof_align",
    """
    SELECT c.event_id, c.user_id, c.ts,
           p.value AS last_purchase_value
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                    WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
    doc="J6 — as-of join: each click aligned to the user's most recent "
    "purchase value at or before it. Spark form: union + "
    "last(ignorenulls) window, one shuffle (SURVEY.md §2.3 J6); DuckDB "
    "form: native ASOF JOIN.",
    tags=("join", "asof"),
)
def j6_asof_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    return joins.asof_align(
        clicks, purchases, on="user_id", ts="ts", value="value",
        out="last_purchase_value",
    )


@register(
    "j6b_asof_forward",
    """
    SELECT c.event_id, c.user_id, c.ts,
           p.value AS next_purchase_value
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                    WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND p.ts >= c.ts
    """,
    doc="J6b — FORWARD as-of join: each click aligned to the user's "
    "NEXT purchase value at or after it (the time-to-conversion "
    "lookup; j6 is the backward form). Same single-shuffle "
    "union+window shape with the frame looking ahead "
    "(first ignorenulls over [current, unbounded following]).",
    tags=("join", "asof"),
    late=True,
)
def j6b_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    return joins.asof_align(
        clicks, purchases, on="user_id", ts="ts", value="value",
        out="next_purchase_value", direction="forward",
    )


# ---------------------------------------------------------------------------
# J7 — range/band join (theta join demo)
# ---------------------------------------------------------------------------

_BANDS = [("low", 0.0, 10000.0), ("mid", 10000.0, 40000.0), ("high", 40000.0, 1e18)]
_BANDS_SQL = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)


@register(
    "j7_band_join",
    auctions_sql(
        f""",
        bands(band, lo, hi) AS (VALUES {_BANDS_SQL})
        SELECT band, COUNT(*) AS n_auctions, {r4sql("SUM(quantity)")} AS total_quantity
        FROM auctions JOIN bands ON buyout >= lo AND buyout < hi
        GROUP BY band
        """
    ),
    doc="J7 — theta/range join: facts banded into price ranges via a "
    "broadcast nested-loop join against an inline band table.",
    tags=("join",),
)
def j7_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = spark.createDataFrame(_BANDS, "band string, lo double, hi double")
    return (
        joins.band_join(auctions(spark, sf_dir), bands, "buyout")
        .groupBy("band")
        .agg(
            F.count("*").alias("n_auctions"),
            r4(F.sum("quantity")).alias("total_quantity"),
        )
    )


# ---------------------------------------------------------------------------
# U1–U4 — set operations (new / removed / persisting / union)
# ---------------------------------------------------------------------------


@register(
    "u1_setop_churn",
    f"""
    WITH prev AS (
        SELECT DISTINCT user_id FROM events
        WHERE CAST(ts AS DATE) = DATE '{DAY_A}'
    ),
    next AS (
        SELECT DISTINCT user_id FROM events
        WHERE CAST(ts AS DATE) = DATE '{DAY_B}'
    )
    SELECT 'new' AS status, user_id
    FROM (SELECT user_id FROM next EXCEPT SELECT user_id FROM prev)
    UNION ALL
    SELECT 'removed' AS status, user_id
    FROM (SELECT user_id FROM prev EXCEPT SELECT user_id FROM next)
    UNION ALL
    SELECT 'persisting' AS status, user_id
    FROM (SELECT user_id FROM prev INTERSECT SELECT user_id FROM next)
    """,
    doc="U1+U2+U3 — snapshot set algebra in one labeled relation: "
    "EXCEPT both ways (new/removed) and INTERSECT (persisting). The "
    "three set operators exercised literally; J3 is the single-join "
    "form of the same classification.",
    tags=("setop",),
)
def u1_setop_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The three set-op branches each consume BOTH day-slices; without a
    # materialization barrier the plan re-scans and re-distincts events
    # six times (r4 plan audit: 6 scans / 6 shuffles for a 0.8 s query
    # that should cost 0.3 s). localCheckpoint truncates the lineage so
    # each slice is scanned+deduped once and the EXCEPT/INTERSECT
    # branches read the materialized blocks. At cluster scale the same
    # shape holds with `.persist()` + a shared scan.
    prev = _day_users(spark, sf_dir, DAY_A).transform(barrier)
    nxt = _day_users(spark, sf_dir, DAY_B).transform(barrier)
    lab = lambda df, s: df.select(  # noqa: E731
        F.lit(s).alias("status"), "user_id"
    )
    return (
        lab(nxt.exceptAll(prev), "new")
        .unionAll(lab(prev.exceptAll(nxt), "removed"))
        .unionAll(lab(prev.intersect(nxt), "persisting"))
    )


@register(
    "u4_nation_union",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="U4 — distinct union of key sets across two relations.",
    tags=("setop",),
)
def u4_nation_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tables.load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = tables.load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


# ---------------------------------------------------------------------------
# A6 / A8 — rollup and cube (regional rollups; free in Spark)
# ---------------------------------------------------------------------------


@register(
    "a6_region_rollup",
    """
    SELECT r_name AS region_name, n_name AS nation_name,
           COUNT(c_custkey) AS customer_count,
           {AB} AS total_acctbal
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (r_name, n_name)
    """.format(AB=r4sql("COALESCE(SUM(c_acctbal), 0)")),
    doc="A6 — regional rollup: region/nation/grand-total levels in one "
    "pass (GROUPING SETS; partial aggregation reused across levels).",
    tags=("agg", "rollup"),
)
def a6_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = tables.load(spark, sf_dir, "region")
    nation = tables.load(spark, sf_dir, "nation")
    customer = tables.load(spark, sf_dir, "customer")
    return (
        region.join(F.broadcast(nation), nation.n_regionkey == region.r_regionkey)
        .join(customer, customer.c_nationkey == nation.n_nationkey)
        .select(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            "c_custkey",
            "c_acctbal",
        )
        .rollup("region_name", "nation_name")
        .agg(
            F.count("c_custkey").alias("customer_count"),
            r4(F.coalesce(F.sum("c_acctbal"), F.lit(0))).alias("total_acctbal"),
        )
    )


@register(
    "a8_flag_status_cube",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           {Q} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """.format(Q=r4sql("SUM(l_quantity)")),
    doc="A8 — cube over (returnflag, linestatus): all grouping-set "
    "combinations in one aggregation.",
    tags=("agg", "rollup"),
)
def a8_flag_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        r4(F.sum("l_quantity")).alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# A9 — approx distinct (scale-path variant; sketches differ per engine
# so the oracle checks the EXACT count while Spark also reports approx)
# ---------------------------------------------------------------------------


@register(
    "a9_approx_distinct_owners",
    None,  # HLL sketches differ between engines → rows-only check
    doc="A9 — approx_count_distinct of owners per snapshot group: the "
    "100 TB path for A3 (no exact distinct shuffle). Rows-only: HLL "
    "estimates are engine-specific.",
    tags=("agg", "approx"),
)
def a9_approx_distinct_owners(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        auctions(spark, sf_dir)
        .groupBy("time_left")
        .agg(F.approx_count_distinct("owner", 0.01).alias("approx_owner_count"))
    )


# ---------------------------------------------------------------------------
# J8 — skew-resistant salted join (registered demo of operators/joins.
# salted_join; results are provably identical to the plain join)
# ---------------------------------------------------------------------------


@register(
    "j8_salted_skew_join",
    rf"""
    WITH ts AS (
        SELECT event_type, AVG(value) AS type_mean
        FROM events GROUP BY 1
    )
    SELECT e.user_id, e.event_type,
           COUNT(*) AS n_events,
           {r4sql("AVG(e.value - ts.type_mean)")} AS mean_dev
    FROM events e JOIN ts USING (event_type)
    GROUP BY 1, 2
    """,
    doc="J8 — the skew-mitigation join as a first-class registered "
    "query: the events fact joins its per-type mean back on "
    "event_type, a 5-value key. A plain shuffle join puts each key in "
    "ONE task — 5 tasks do all the work no matter how many executors "
    "exist. operators/joins.salted_join spreads every key over 16 "
    "salted shuffle partitions (dim side replicated 16×), so the "
    "oracle — a plain SQL join — proves salting changes row "
    "DISTRIBUTION only, never results. At 100 TB this is the "
    "big-big/hot-key fallback when the small side is too large to "
    "broadcast and AQE can't re-plan the skewed exchange.",
    tags=("join", "skew"),
    late=True,
)
def j8_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    type_stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("type_mean")
    )
    joined = joins.salted_join(ev, type_stats, "event_type", n_salts=16)
    return joined.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_events"),
        r4(F.avg(F.col("value") - F.col("type_mean"))).alias("mean_dev"),
    )


# ---------------------------------------------------------------------------
# U7 — multiset (bag) set operations: EXCEPT ALL / INTERSECT ALL
# ---------------------------------------------------------------------------


@register(
    "u7_bag_setops",
    f"""
    WITH a AS (
        SELECT user_id, event_type FROM events
        WHERE CAST(ts AS DATE) = DATE '{DAY_A}'
    ), b AS (
        SELECT user_id, event_type FROM events
        WHERE CAST(ts AS DATE) = DATE '{DAY_B}'
    ), ex AS (
        SELECT * FROM a EXCEPT ALL SELECT * FROM b
    ), ia AS (
        SELECT * FROM a INTERSECT ALL SELECT * FROM b
    )
    SELECT 'except_all' AS op, event_type, COUNT(*) AS n
    FROM ex GROUP BY event_type
    UNION ALL
    SELECT 'intersect_all' AS op, event_type, COUNT(*) AS n
    FROM ia GROUP BY event_type
    """,
    doc="U7 — bag semantics for the churn set ops: EXCEPT ALL keeps "
    "surplus MULTIPLICITY (a user who clicked 3x on day A and 1x on "
    "day B contributes 2 rows), INTERSECT ALL the shared floor — the "
    "distinct-set forms (U1-U3) can't express per-occurrence deltas. "
    "Spark plans both as one aggregate computing per-key counts on "
    "each side + a generate replaying min/surplus counts — no row-by-"
    "row matching join.",
    tags=("setop", "bag"),
    late=True,
)
def u7_bag_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")

    def day(d: str) -> DataFrame:
        return ev.filter(F.col("ts").cast("date") == d).select(
            "user_id", "event_type"
        )

    a, b = day(DAY_A), day(DAY_B)
    ex = (
        a.exceptAll(b)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "event_type", "n")
    )
    ia = (
        a.intersectAll(b)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "event_type", "n")
    )
    return ex.unionByName(ia)


# ---------------------------------------------------------------------------
# A17 — mergeable distinct sketches (incremental COUNT(DISTINCT))
# ---------------------------------------------------------------------------


@register(
    "a17_sketch_distinct_owners",
    None,  # HLL sketch binaries are engine-specific — rows-only; the
    # estimate/merge invariants are pinned by tests/test_medallion.py
    doc="A17 — distinct owners per time_left tier read off MERGEABLE "
    "HLL sketches: daily partial sketches (the stored refresh state) "
    "unioned per tier, estimate taken from the merged sketch. The "
    "incremental form of A3/A9: a refresh unions ONE day's sketches "
    "instead of rescanning history — union is associative, so batch "
    "order and partitioning can't change the answer (asserted exactly "
    "in tests). Datasketches HLL via Spark-native hll_sketch_agg / "
    "hll_union_agg — all JVM aggregates, two map-combined shuffles.",
    tags=("agg", "sketch", "rows-only", "incremental"),
    late=True,
)
def a17_sketch_distinct_owners(spark: SparkSession, sf_dir: str) -> DataFrame:
    from server_spark.plans.maintenance import (
        distinct_sketches,
        estimate_distinct,
    )

    live = auctions(spark, sf_dir).withColumn(
        "day", F.to_date("dump_ts")
    )
    partials = distinct_sketches(live, ["time_left", "day"], "owner")
    merged = partials.groupBy("time_left").agg(
        F.hll_union_agg("sketch").alias("sketch")
    )
    return estimate_distinct(merged, ["time_left"]).orderBy("time_left")


# ---------------------------------------------------------------------------
# A18 — item affinity (market-basket co-occurrence with lift)
# ---------------------------------------------------------------------------

_A18_MAX_ITEM = 40   # frequent-itemset gate: catalog subset first
_A18_TOP = 50


@register(
    "a18_item_affinity",
    auctions_sql(
        f""",
        base AS (
            SELECT DISTINCT owner, item FROM auctions
            WHERE item <= {_A18_MAX_ITEM}
        ),
        n AS (SELECT COUNT(DISTINCT owner) AS n_owners FROM base),
        per_item AS (SELECT item, COUNT(*) AS cnt FROM base GROUP BY item),
        pairs AS (
            SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS both_cnt
            FROM base a JOIN base b
              ON a.owner = b.owner AND a.item < b.item
            GROUP BY 1, 2
        )
        SELECT item_a, item_b, both_cnt,
               {r4sql("both_cnt * 1.0 / n.n_owners")} AS support,
               {r4sql("both_cnt * 1.0 / pa.cnt")} AS confidence,
               {r4sql("both_cnt * 1.0 * n.n_owners / (pa.cnt * pb.cnt)")} AS lift
        FROM pairs
        JOIN per_item pa ON item_a = pa.item
        JOIN per_item pb ON item_b = pb.item
        CROSS JOIN n
        ORDER BY lift DESC, item_a, item_b
        LIMIT {_A18_TOP}
        """
    ),
    doc="A18 (EXT analytics) — MARKET-BASKET affinity over the live "
    "snapshot: item pairs co-offered by the same owner, scored with "
    "support / confidence / lift (association-rule mining's first "
    "pass — 'sellers of X also stock Y'). Scale shape: the "
    "frequent-itemset gate (catalog subset / min-support) lands "
    "BEFORE the owner-keyed self-join, so per-owner pair explosion "
    "is bounded by the gated item count, never the raw basket size; "
    "the join shuffles once on owner, counts are one hash-agg, the "
    "result is a distributed top-k on lift.",
    tags=("join", "agg"),
    late=True,
)
def a18_item_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        auctions(spark, sf_dir)
        .filter(F.col("item") <= _A18_MAX_ITEM)
        .select("owner", "item")
        .distinct()
        .transform(barrier)  # feeds totals, per-item counts AND the pair join
    )
    n = base.agg(F.countDistinct("owner").alias("n_owners"))
    per_item = base.groupBy("item").agg(F.count("*").alias("cnt"))
    a = base.select(F.col("owner"), F.col("item").alias("item_a"))
    b = base.select(F.col("owner"), F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "owner")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("both_cnt"))
    )
    scored = (
        pairs.join(
            F.broadcast(per_item.select(F.col("item").alias("item_a"),
                                        F.col("cnt").alias("cnt_a"))),
            "item_a",
        )
        .join(
            F.broadcast(per_item.select(F.col("item").alias("item_b"),
                                        F.col("cnt").alias("cnt_b"))),
            "item_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "item_a", "item_b", "both_cnt",
            r4(F.col("both_cnt") / F.col("n_owners")).alias("support"),
            r4(F.col("both_cnt") / F.col("cnt_a")).alias("confidence"),
            r4(
                F.col("both_cnt") * F.col("n_owners")
                / (F.col("cnt_a") * F.col("cnt_b"))
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), "item_a", "item_b"
    ).limit(_A18_TOP)


# ---------------------------------------------------------------------------
# A20 — item PageRank over the co-listing graph (iterative propagation)
# ---------------------------------------------------------------------------

_PR_ITERS = 10
_PR_DAMP = 0.85


@register(
    "a20_item_pagerank",
    None,  # rows-only: fixed-iteration propagation (no honest SQL twin —
    # aggregates are illegal in a recursive CTE's recursive member)
    doc="A20 (EXT analytics) — weighted PAGERANK over the item "
    "co-listing graph (a18's edges, symmetric, weighted by co-seller "
    "count): 10 damped iterations of r ← (1−d)/N + d·Σ r(u)·w/wdeg(u) "
    "— the canonical iterative-propagation workload beyond connected "
    "components (centrality: which items anchor the market graph). "
    "Scale shape: each iteration is ONE join of the rank vector "
    "(nodes-sized) to the edge list plus a hash-agg — the classic "
    "Pregel-as-joins form; lineage is cut through barrier() every "
    "iteration so 10 rounds never stack into one mega-plan (flips to "
    "reliable checkpoints under SPARK_GRAFT_CHECKPOINT_DIR). "
    "Deterministic: fixed iterations, dangling mass redistributed "
    "uniformly, 4-decimal canonical output; pinned against a "
    "plain-Python reference in tests.",
    tags=("ext", "agg", "graph", "rows-only"),
    late=True,
)
def a20_item_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        auctions(spark, sf_dir)
        .filter(F.col("item") <= _A18_MAX_ITEM)
        .select("owner", "item")
        .distinct()
    )
    a = base.select(F.col("owner"), F.col("item").alias("src"))
    b = base.select(F.col("owner"), F.col("item").alias("dst"))
    edges = (
        a.join(b, "owner")
        .filter(F.col("src") != F.col("dst"))  # both directions kept
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
        .transform(barrier)  # reused every iteration
    )
    wdeg = edges.groupBy("src").agg(F.sum("w").alias("wdeg"))
    norm_edges = edges.join(wdeg, "src").select(
        "src", "dst", (F.col("w") / F.col("wdeg")).alias("p")
    ).transform(barrier)
    nodes = edges.select(F.col("src").alias("item")).distinct().transform(
        barrier
    )
    n = nodes.count()  # bounded: gated item subset
    if n == 0:  # empty graph (fresh deployment / over-pruned slice)
        return nodes.select(
            "item", F.lit(None).cast("double").alias("rank_norm")
        )
    ranks = nodes.select("item", F.lit(1.0 / n).alias("r"))
    for i in range(_PR_ITERS):
        contrib = (
            ranks.join(norm_edges, ranks.item == norm_edges.src)
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("p")).alias("inflow"))
        )
        ranks = nodes.join(contrib, nodes.item == contrib.dst, "left").select(
            "item",
            (
                F.lit((1.0 - _PR_DAMP) / n)
                + _PR_DAMP * F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("r"),
        )
        if i % 3 == 2:  # cut lineage every 3 rounds: plans stay
            ranks = barrier(ranks)  # shallow without a per-round sync
    return ranks.select(
        "item", r4(F.col("r") * n).alias("rank_norm")
    ).orderBy(F.col("rank_norm").desc(), "item")


# ---------------------------------------------------------------------------
# A21 — triangle counting / clustering coefficient over the co-listing graph
# ---------------------------------------------------------------------------


@register(
    "a21_triangle_count",
    auctions_sql(
        f""",
        base AS (
            SELECT DISTINCT owner, item FROM auctions
            WHERE item <= {_A18_MAX_ITEM}
        ),
        edges AS (
            SELECT DISTINCT a.item AS s, b.item AS t
            FROM base a JOIN base b
              ON a.owner = b.owner AND a.item < b.item
        ),
        tris AS (
            SELECT e1.s AS a, e1.t AS b, e2.t AS c
            FROM edges e1
            JOIN edges e2 ON e1.t = e2.s
            JOIN edges e3 ON e3.s = e1.s AND e3.t = e2.t
        ),
        node_tri AS (
            SELECT item, COUNT(*) AS triangles FROM (
                SELECT a AS item FROM tris
                UNION ALL SELECT b AS item FROM tris
                UNION ALL SELECT c AS item FROM tris
            ) GROUP BY 1
        ),
        deg AS (
            SELECT item, COUNT(*) AS degree FROM (
                SELECT s AS item FROM edges
                UNION ALL SELECT t AS item FROM edges
            ) GROUP BY 1
        )
        SELECT d.item AS item, d.degree AS degree,
               COALESCE(nt.triangles, 0) AS triangles,
               {r4sql("CASE WHEN d.degree >= 2 THEN "
                      "2.0 * COALESCE(nt.triangles, 0) "
                      "/ (d.degree * (d.degree - 1)) ELSE 0.0 END")}
                   AS clustering_coeff
        FROM deg d LEFT JOIN node_tri nt ON d.item = nt.item
        ORDER BY item
        """
    ),
    doc="A21 (EXT analytics) — TRIANGLE COUNTING + local clustering "
    "coefficient over the item co-listing graph (a18's edges, "
    "undirected, deduplicated s<t): per node, how many of its "
    "neighbor pairs are themselves connected — the graph-cohesion "
    "metric behind community detection and spam-subgraph flags, and "
    "(with a20's PageRank and x15's connected components) the third "
    "canonical graph workload, expressed as pure relational algebra: "
    "triangle enumeration is the classic two-hop equi-join "
    "edges⋈edges⋈edges with the a<b<c orientation making each "
    "triangle appear EXACTLY once (no division by 6). Scale shape: "
    "the frequent-itemset gate bounds the edge list before any join; "
    "at web scale the same plan runs with the standard "
    "degree-ordered orientation (orient edges low-degree→high) which "
    "bounds the two-hop fan-out by the arboricity — the join/agg "
    "skeleton is unchanged.",
    tags=("ext", "join", "graph"),
    late=True,
)
def a21_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        auctions(spark, sf_dir)
        .filter(F.col("item") <= _A18_MAX_ITEM)
        .select("owner", "item")
        .distinct()
    )
    a = base.select(F.col("owner"), F.col("item").alias("s"))
    b = base.select(F.col("owner"), F.col("item").alias("t"))
    edges = (
        a.join(b, "owner")
        .filter(F.col("s") < F.col("t"))
        .select("s", "t")
        .distinct()
        .transform(barrier)  # reused 5x below: 3 triangle legs + 2 degrees
    )
    e1 = edges.select(F.col("s").alias("a"), F.col("t").alias("b"))
    e2 = edges.select(F.col("s").alias("b"), F.col("t").alias("c"))
    e3 = edges.select(F.col("s").alias("a"), F.col("t").alias("c"))
    tris = e1.join(e2, "b").join(e3, ["a", "c"])
    node_tri = (
        tris.select(F.col("a").alias("item"))
        .unionByName(tris.select(F.col("b").alias("item")))
        .unionByName(tris.select(F.col("c").alias("item")))
        .groupBy("item")
        .agg(F.count("*").alias("triangles"))
    )
    deg = (
        edges.select(F.col("s").alias("item"))
        .unionByName(edges.select(F.col("t").alias("item")))
        .groupBy("item")
        .agg(F.count("*").alias("degree"))
    )
    joined = deg.join(node_tri, "item", "left").select(
        "item", "degree",
        F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
    )
    return joined.select(
        "item", "degree", "triangles",
        r4(
            F.when(
                F.col("degree") >= 2,
                2.0 * F.col("triangles")
                / (F.col("degree") * (F.col("degree") - 1)),
            ).otherwise(0.0)
        ).alias("clustering_coeff"),
    ).orderBy("item")


# ---------------------------------------------------------------------------
# A22 — EXACT mergeable distinct counts via bitmap aggregates
# ---------------------------------------------------------------------------


@register(
    "a22_bitmap_distinct",
    auctions_sql(
        """
        SELECT time_left, COUNT(DISTINCT item) AS distinct_items
        FROM auctions GROUP BY 1 ORDER BY 1
        """
    ),
    doc="A22 — EXACT distinct items per time_left tier via BITMAP "
    "aggregates (bitmap_bucket_number / bitmap_bit_position / "
    "bitmap_construct_agg / bitmap_count — the Doris/ClickHouse "
    "roaring-bitmap pattern on Spark-native functions): integer keys "
    "land as bits in fixed 32k-bit buckets, per-(group, bucket) "
    "bitmaps OR-merge associatively, the final count sums popcounts. "
    "Fills the gap between A3 (exact COUNT DISTINCT — full shuffle "
    "of distinct values every refresh) and A9/A17 (HLL — mergeable "
    "but approximate): bitmaps are BOTH exact and mergeable, so an "
    "incremental gold can store per-day bitmap partials and fold new "
    "days without rescanning history, at exact-answer fidelity. "
    "Scale: state is O(key-range/8 bytes) worst case but dense keys "
    "compress to ~1 bit/key — the standard exact-distinct engine "
    "for bounded-integer id spaces (items, user ids); arbitrary "
    "strings stay on HLL (a17).",
    tags=("agg", "bitmap", "incremental"),
    late=True,
)
def a22_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    live = auctions(spark, sf_dir).select("time_left", "item")
    partials = live.groupBy(
        "time_left", F.bitmap_bucket_number("item").alias("bkt")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("item")).alias("bm")
    )
    return (
        partials.groupBy("time_left")
        .agg(F.sum(F.bitmap_count("bm")).alias("distinct_items"))
        .orderBy("time_left")
    )


# ---------------------------------------------------------------------------
# J12 — Bloom-filter pre-join reduction (semi-join pushdown by hand)
# ---------------------------------------------------------------------------

_J12_BRAND = "Brand#23"
_J12_M = 1 << 16          # bloom bits (8 KiB as 1024 longs)
_J12_K = 4                # hash functions


@register(
    "j12_bloom_prejoin",
    auctions_sql(
        f"""
        SELECT time_left, COUNT(*) AS n_auctions,
               {r4sql("SUM(buyout)")} AS gross
        FROM auctions
        WHERE item IN (
            SELECT p_partkey FROM part WHERE p_brand = '{_J12_BRAND}'
        )
        GROUP BY 1 ORDER BY 1
        """
    ),
    doc="J12 — hand-built BLOOM-FILTER pre-join reduction: the "
    "selective item dimension (one brand, ~4% of the catalog) is "
    "folded into a 64 Ki-bit bloom (4x xxhash64, packed into 1024 "
    "longs via bit_or — an 8 KiB broadcast), the fact stream drops "
    "non-members with k O(1) word probes BEFORE the shuffle, and the "
    "exact semi join afterwards removes the ~5e-6 false-positive "
    "residue — so the answer provably equals the plain semi join "
    "(the oracle) while the exchange moves ~4% of the rows. This is "
    "Spark's own runtime row-level filtering (j10) made PORTABLE and "
    "explicit: the same trick pre-filters aggregations, feeds "
    "engines without InSubqueryExec pushdown, and survives when the "
    "dim side is itself a subquery the optimizer won't inline. The "
    "final join is pinned to shuffle (hint) because at 100 TB the "
    "dim outgrows autoBroadcast — exactly the regime where the "
    "bloom's pre-shuffle row cut pays; FP math: (1-e^(-kn/m))^k "
    "with n=|keys|, m=2^16, k=4.",
    tags=("join", "bloom", "runtime-filter"),
    late=True,
)
def j12_bloom_prejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = (
        tables.load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == _J12_BRAND)
        .select(F.col("p_partkey").alias("item"))
    )
    m, k = _J12_M, _J12_K

    def _positions(col):
        return [
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m)).cast("int")
            for i in range(k)
        ]

    # dim -> distinct bit positions -> 1024 packed longs (ONE row).
    positions = dim.select(
        F.explode(F.array(*_positions(F.col("item")))).alias("p")
    ).distinct()
    words = positions.groupBy(
        (F.col("p") / 64).cast("int").alias("w")
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT)))"
        ).alias("bits")
    )
    bloom = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(m // 64 - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("wm"), i), F.lit(0).cast("bigint")
            ),
        ).alias("bloom_words")
    )

    fact = auctions(spark, sf_dir).select("item", "time_left", "buyout")
    pcols = _positions(F.col("item"))
    probed = fact.select(
        "*", *[p.alias(f"_bp{i}") for i, p in enumerate(pcols)]
    ).crossJoin(F.broadcast(bloom))
    member = F.expr(
        " AND ".join(
            f"(element_at(bloom_words, CAST(_bp{i} / 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(_bp{i} % 64 AS INT)))"
            f" <> 0"
            for i in range(k)
        )
    )
    pre = probed.filter(member).drop(
        "bloom_words", *[f"_bp{i}" for i in range(k)]
    )

    # Exact verify: shuffle semi join (the 100 TB regime — dim too big
    # to broadcast), operating on the bloom-thinned fact.
    exact = pre.join(dim.hint("shuffle_hash"), "item", "left_semi")
    return (
        exact.groupBy("time_left")
        .agg(
            F.count("*").alias("n_auctions"),
            r4(F.sum("buyout")).alias("gross"),
        )
        .orderBy("time_left")
    )


# ---------------------------------------------------------------------------
# A23 — sketch ALGEBRA: owner-set overlap across tiers via HLL
# inclusion-exclusion (no exact distinct shuffle, mergeable inputs)
# ---------------------------------------------------------------------------


@register(
    "a23_sketch_overlap",
    None,  # HLL estimates are engine-specific — rows-only; the
    # inclusion-exclusion error bound is pinned by pytest against the
    # exact overlap (tests/test_extensions.py)
    doc="A23 — sketch-algebra OVERLAP estimation: for every pair of "
    "time_left tiers, the estimated number of owners active in BOTH, "
    "via HLL inclusion-exclusion |A∩B| ≈ est(A)+est(B)−est(A∪B) — "
    "answered entirely from the a17 gold's stored per-tier sketches "
    "(union is hll_union, one tiny pairwise cross of K sketch rows), "
    "so the cross-tier overlap dashboard never rescans history. "
    "Intersection error grows with |A∪B|·ε (not |A∩B|·ε) — the "
    "documented HLL caveat: fine for 'do these tiers share most "
    "sellers', wrong tool for tiny intersections of huge sets (exact "
    "bitmap golds — a22 — cover that case for integer keys). "
    "Negative estimates from error cancellation clamp to 0.",
    tags=("agg", "sketch", "rows-only"),
    late=True,
)
def a23_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    live = auctions(spark, sf_dir)
    sketches = live.groupBy("time_left").agg(
        F.hll_sketch_agg("owner", F.lit(12)).alias("sk")
    ).transform(barrier)  # K rows (one per tier), reused three ways
    a = sketches.select(
        F.col("time_left").alias("tier_a"), F.col("sk").alias("sk_a")
    )
    b = sketches.select(
        F.col("time_left").alias("tier_b"), F.col("sk").alias("sk_b")
    )
    pairs = a.join(b, F.col("tier_a") < F.col("tier_b"))
    est_a = F.hll_sketch_estimate("sk_a")
    est_b = F.hll_sketch_estimate("sk_b")
    est_u = F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
    return pairs.select(
        "tier_a", "tier_b",
        est_a.alias("est_owners_a"),
        est_b.alias("est_owners_b"),
        est_u.alias("est_owners_union"),
        F.greatest(
            F.lit(0).cast("long"), est_a + est_b - est_u
        ).alias("est_owners_both"),
    ).orderBy("tier_a", "tier_b")


# ---------------------------------------------------------------------------
# A24 — market concentration (Herfindahl–Hirschman index per item)
# ---------------------------------------------------------------------------

_A24_MIN_LISTINGS = 20


@register(
    "a24_market_concentration",
    auctions_sql(
        f"""
        , owner_vol AS (
            SELECT item, owner, SUM(quantity) AS q
            FROM auctions GROUP BY item, owner
        ),
        item_tot AS (
            SELECT item, SUM(q) AS tot, COUNT(*) AS n_owners
            FROM owner_vol GROUP BY item
        )
        SELECT ov.item AS item, it.n_owners AS n_owners,
               {r4sql("SUM((ov.q * 1.0 / it.tot) * (ov.q * 1.0 / it.tot))")}
                   AS hhi,
               {r4sql("MAX(ov.q) * 1.0 / ANY_VALUE(it.tot)")}
                   AS top_owner_share
        FROM owner_vol ov JOIN item_tot it ON ov.item = it.item
        WHERE it.tot >= {_A24_MIN_LISTINGS}
        GROUP BY ov.item, it.n_owners
        ORDER BY hhi DESC, item
        """
    ),
    doc="A24 (EXT analytics) — MARKET CONCENTRATION per item: the "
    "Herfindahl–Hirschman index Σ share² over seller quantity shares "
    "plus the top seller's share — the monopoly-detection metric an "
    "auction-house operator watches (HHI → 1 means one seller "
    "controls the item; pairs with a19's Pareto view of revenue "
    "concentration across ITEMS by measuring concentration across "
    "SELLERS within an item). Shape: two stacked hash-aggs on "
    "(item, owner) then item — the second rides the first's "
    "partitioning prefix, and the share arithmetic is pure codegen; "
    "nothing beyond the one fact scan.",
    tags=("ext", "agg"),
    late=True,
)
def a24_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    owner_vol = (
        auctions(spark, sf_dir)
        .groupBy("item", "owner")
        .agg(F.sum("quantity").alias("q"))
    )
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


# ---------------------------------------------------------------------------
# A25 — price co-movement network (pairwise series correlation)
# ---------------------------------------------------------------------------

_A25_MIN_DAYS = 10


@register(
    "a25_price_correlation",
    auctions_sql(
        f"""
        , daily AS (
            SELECT item, CAST(dump_ts AS DATE) AS day,
                   AVG(buyout / quantity) AS p
            FROM auctions
            WHERE item <= {_A18_MAX_ITEM} AND buyout > 0
            GROUP BY 1, 2
        )
        SELECT a.item AS item_a, b.item AS item_b,
               COUNT(*) AS n_days,
               {r4sql("corr(a.p, b.p)")} AS price_corr
        FROM daily a JOIN daily b
          ON a.day = b.day AND a.item < b.item
        GROUP BY 1, 2
        HAVING COUNT(*) >= {_A25_MIN_DAYS}
           AND corr(a.p, b.p) IS NOT NULL
        ORDER BY item_a, item_b
        """
    ),
    doc="A25 (EXT analytics) — price CO-MOVEMENT network: pairwise "
    "Pearson correlation of per-item daily average unit prices over "
    "their common trading days — the statistical sibling of a18's "
    "co-listing affinity (a18 asks 'stocked together?', this asks "
    "'do their PRICES move together?' — substitutes correlate "
    "positively, crafting inputs track their outputs, and a "
    "manipulated pair stands out by correlating with nothing). "
    "Shape: one daily hash-agg, then the pair space keyed on the "
    "SHARED day (the join explodes per-day, not all-pairs-up-front) "
    "with corr() as a map-side-combinable moment aggregate; the "
    "item gate bounds the matrix exactly like a18/a21 — at full "
    "catalog the same query runs per category or over the a19 "
    "A-class head, never the raw 10M-item square.",
    tags=("ext", "agg", "correlation"),
    late=True,
)
def a25_price_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        auctions(spark, sf_dir)
        .filter((F.col("item") <= _A18_MAX_ITEM) & (F.col("buyout") > 0))
        .groupBy("item", F.col("dump_ts").cast("date").alias("day"))
        .agg(F.avg(F.col("buyout") / F.col("quantity")).alias("p"))
    )
    a = daily.select(
        F.col("item").alias("item_a"), "day", F.col("p").alias("pa")
    )
    b = daily.select(
        F.col("item").alias("item_b"), "day", F.col("p").alias("pb")
    )
    joined = (
        a.join(b, "day")
        .filter(F.col("item_a") < F.col("item_b"))
        .transform(barrier)  # reused: variance gate + corr pass
    )
    # corr() must only evaluate on variance-positive pairs: under ANSI
    # mode Spark's corr THROWS DIVIDE_BY_ZERO on a constant series
    # (found by the extended fuzz soak; DuckDB returns NULL, which the
    # oracle's IS NOT NULL drops). A variance pre-pass selects exactly
    # the pairs DuckDB keeps — var_samp is zero, not an error, on
    # constant input in both engines.
    good = (
        joined.groupBy("item_a", "item_b")
        .agg(
            F.count("*").alias("n_days"),
            F.var_samp("pa").alias("vpa"),
            F.var_samp("pb").alias("vpb"),
        )
        .filter(
            (F.col("n_days") >= _A25_MIN_DAYS)
            & (F.col("vpa") > 0)
            & (F.col("vpb") > 0)
        )
        .select("item_a", "item_b")
    )
    return (
        joined.join(F.broadcast(good), ["item_a", "item_b"], "left_semi")
        .groupBy("item_a", "item_b")
        .agg(
            F.count("*").alias("n_days"),
            r4(F.corr("pa", "pb")).alias("price_corr"),
        )
        .orderBy("item_a", "item_b")
    )


# ---------------------------------------------------------------------------
# A26 — Benford first-digit screen (price-manipulation detector)
# ---------------------------------------------------------------------------

_A26_MIN_N = 200  # listings per owner before the test has power


@register(
    "a26_benford_screen",
    auctions_sql(
        f"""
        , digits AS (
            SELECT owner,
                   CAST(regexp_extract(CAST(buyout AS STRING),
                                       '[1-9]', 0) AS BIGINT) AS d
            FROM auctions WHERE buyout > 0
        ),
        dist AS (
            SELECT owner, d, COUNT(*) AS obs,
                   SUM(COUNT(*)) OVER (PARTITION BY owner) AS n
            FROM digits GROUP BY owner, d
        ),
        chi AS (
            SELECT owner, ANY_VALUE(n) AS n_listings,
                   SUM(POW(obs - n * LOG10(1.0 + 1.0 / d), 2)
                       / (n * LOG10(1.0 + 1.0 / d))) AS chi2
            FROM dist GROUP BY owner
        )
        SELECT owner, n_listings, {r4sql("chi2")} AS chi2,
               chi2 > 15.507 AS flagged
        FROM chi
        WHERE n_listings >= {_A26_MIN_N}
        ORDER BY chi2 DESC, owner
        """
    ),
    doc="A26 (EXT analytics) — BENFORD first-digit screen per seller: "
    "the chi-square distance between each owner's leading-digit "
    "distribution of buyout prices and Benford's law (P(d) = "
    "log10(1+1/d)) — the classic forensic-accounting test, here the "
    "bot/manipulation screen (organic prices follow Benford closely; "
    "scripted price ladders and round-number undercutting do not). "
    "flagged = chi2 over the 0.95 quantile of chi²(8 df). The "
    "leading digit comes from the price's STRING form (first [1-9] "
    "of the shortest repr) — deliberately NOT floor(v/10^floor("
    "log10 v)): libm log10 can land an ulp under an integer at "
    "powers of ten and flip the digit differently per engine, while "
    "shortest-repr digits are engine-identical (the r4 lesson). "
    "Shape: one narrow map, one (owner, digit) hash-agg, one "
    "owner-partitioned total window over ≤9 rows per owner, one "
    "final 9-row-per-owner agg — all map-combinable.",
    tags=("ext", "agg", "fraud"),
    late=True,
)
def a26_benford_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    digits = (
        auctions(spark, sf_dir)
        .filter(F.col("buyout") > 0)
        .select(
            "owner",
            F.regexp_extract(
                F.col("buyout").cast("string"), "[1-9]", 0
            ).cast("bigint").alias("d"),
        )
    )
    dist = digits.groupBy("owner", "d").agg(F.count("*").alias("obs"))
    w = Window.partitionBy("owner")
    dist = dist.withColumn("n", F.sum("obs").over(w))
    exp = F.col("n") * F.log10(1.0 + 1.0 / F.col("d"))
    chi = (
        dist.groupBy("owner")
        .agg(
            F.any_value("n").alias("n_listings"),
            F.sum(F.pow(F.col("obs") - exp, 2) / exp).alias("chi2_raw"),
        )
        .filter(F.col("n_listings") >= _A26_MIN_N)
    )
    return chi.select(
        "owner", "n_listings",
        r4(F.col("chi2_raw")).alias("chi2"),
        (F.col("chi2_raw") > 15.507).alias("flagged"),
    ).orderBy(F.col("chi2").desc(), "owner")
