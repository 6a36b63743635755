"""Request-shaped serving façade — the reference's NATS query subjects
as parameterized Python entry points (SURVEY.md §3 lifecycle).

The registry (`server_spark/queries/`) proves each OPERATOR correct
against the oracle with pinned constants; this module is the surface a
CALLER uses: every function mirrors one of the reference's
request/reply subjects (`app/pkg/state/state_*.go` handlers [M]) and
composes the same operator building blocks (`operators/auctions.py`)
with caller-supplied parameters. A user of the reference switches by
mapping each NATS subject to the function of the same shape:

    subject auctions        → query_auctions(AuctionsRequest)
    subject price-list      → price_list(item_ids)
    subject price-list-history → price_list_history(item_ids, ts range)
    subject owners-query    → owners_query(substring)
    subject items-query     → items_query(fuzzy string)
    subject status          → realm_status(region)
    subject mod-dates       → realm_modification_dates(region?)
    subject token-history   → token_history(region)
    subject unmet-demand    → unmet_demand_list(owner_cap, limit)

All functions return lazy DataFrames — the serving layer decides how
to materialize (collect for a reply payload, write for an export).
Filters land before aggregation so Catalyst pushes them into the
scan; pagination keeps the deterministic total order the operator
layer guarantees.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server_spark import tables
from server_spark.operators import auctions as ops
from server_spark.sources.synthetic import auctions


@dataclass
class AuctionsRequest:
    """The reference's auctions request: filters + sort + page.

    ``after`` switches pagination to the KEYSET cursor (the last row
    of the previous page as a dict over the sort key + collapse keys):
    O(count) work at any depth instead of the rank-window's
    O(page·count) — the serving path for deep scrolls. ``page`` is
    ignored when ``after`` is set (a cursor IS the position)."""

    owner_filters: Sequence[str] = field(default_factory=tuple)
    item_filters: Sequence[int] = field(default_factory=tuple)
    sort_kind: str = "buyout"
    sort_descending: bool = True
    page: int = 0
    count: int = 25
    after: dict | None = None


def query_auctions(
    spark: SparkSession, sf_dir: str, req: AuctionsRequest
) -> DataFrame:
    """Filtered + collapsed + sorted + paginated live auctions (the
    S1/P2/P3/A1/O1/O2 composition behind the auctions subject)."""
    live = auctions(spark, sf_dir)
    if req.owner_filters:
        live = ops.filter_by_owners(live, req.owner_filters)
    if req.item_filters:
        live = ops.filter_by_items(live, req.item_filters)
    collapsed = ops.collapse_mini_auctions(live)
    if req.after is not None:
        return ops.paginate_keyset(
            collapsed, req.sort_kind, req.sort_descending, req.count,
            after=req.after,
        )
    order = ops.sort_columns(req.sort_kind, req.sort_descending)
    return ops.paginate(collapsed, order, req.page, req.count)


def cursor_of(req: AuctionsRequest, last_row) -> dict:
    """Build the next page's ``after`` cursor from a returned row —
    the primary sort column plus every collapse key (the total-order
    tuple `paginate_keyset` requires)."""
    key = ops.SORT_KINDS[req.sort_kind]
    return {k: last_row[k] for k in dict.fromkeys((key, *ops.COLLAPSE_KEYS))}


def price_list(
    spark: SparkSession, sf_dir: str, item_ids: Sequence[int]
) -> DataFrame:
    """Per-item price stats for a requested item set (A2 behind the
    price-list subject). The item filter lands before the aggregate,
    so only the requested items' rows leave the scan."""
    live = ops.filter_by_items(auctions(spark, sf_dir), item_ids)
    return ops.price_stats(live)


def price_list_history(
    spark: SparkSession,
    sf_dir: str,
    item_ids: Sequence[int],
    lower_ts: str,
    upper_ts: str,
) -> DataFrame:
    """Per-item daily price series over a time range (W2 behind the
    price-list-history subject), driven off the events table the way
    the reference reads its pricelist-history buckets."""
    ev = tables.load(spark, sf_dir, "events")
    slice_ = ev.filter(
        (F.col("ts") >= F.lit(lower_ts).cast("timestamp"))
        & (F.col("ts") < F.lit(upper_ts).cast("timestamp"))
        & F.col("user_id").isin(list(item_ids))
    )
    return (
        slice_.groupBy(
            F.col("user_id").alias("item"),
            F.date_trunc("day", "ts").alias("day"),
        )
        .agg(
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.avg("value").alias("avg_value"),
            F.count("*").alias("n_points"),
        )
        .orderBy("item", "day")
    )


def owners_query(
    spark: SparkSession, sf_dir: str, query: str, limit: int = 10
) -> DataFrame:
    """Substring owner search (F2 behind the owners-query subject):
    case-insensitive containment, deterministic rank."""
    owners = ops.distinct_owners(auctions(spark, sf_dir))
    # the canonical shape's owner is the numeric supplier key — the
    # substring match runs over its string form (the reference
    # matches owner NAMES; same operator, different rendering)
    rendered = owners.select(
        F.col("owner"), F.col("owner").cast("string").alias("_o")
    )
    # lower BOTH sides: lowering only the query made any letter in it
    # unmatchable the moment owners carry names (r11 review finding)
    hits = rendered.filter(
        F.lower(F.col("_o")).contains(query.lower())
    )
    return (
        hits.orderBy(F.length("_o"), "owner").select("owner").limit(limit)
    )


def items_query(
    spark: SparkSession, sf_dir: str, query: str, limit: int = 10
) -> DataFrame:
    """Fuzzy item-name search (F3 behind the items-query subject):
    levenshtein rank with deterministic ties — the f3 operator's
    serving shape. (The reference's exact RankMatchFold, which adds
    the subsequence gate, is the f3b pandas-UDF twin; this serving
    path keeps the JVM-side expression for scan-speed ranking.)"""
    items = tables.load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("item"),
        F.col("p_name").alias("item_name"),
    )
    q = query.lower()
    scored = items.withColumn(
        "distance", F.levenshtein(F.lower("item_name"), F.lit(q))
    )
    return scored.orderBy("distance", "item").limit(limit)


def _realm_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region→realm hierarchy (region table → nation table), the
    broadcast dimension behind the status/mod-dates/token subjects."""
    nation = tables.load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("realm_id"),
        F.col("n_name").alias("realm_name"),
        F.col("n_regionkey").alias("_rk"),
    )
    region = tables.load(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("_rk"),
        F.col("r_name").alias("region_name"),
    )
    return nation.join(F.broadcast(region), "_rk").drop("_rk")


def realm_status(
    spark: SparkSession, sf_dir: str, region_name: str
) -> DataFrame:
    """The status subject: the connected-realm list for one region
    (the reference replies with the realm roster + metadata; J2's
    hierarchy flatten, filtered to the requested region). The region
    predicate lands on the broadcast dim scan."""
    return (
        _realm_dim(spark, sf_dir)
        .filter(F.col("region_name") == region_name)
        .select("region_name", "realm_id", "realm_name")
        .orderBy("realm_id")
    )


def realm_modification_dates(
    spark: SparkSession, sf_dir: str, region_name: str | None = None
) -> DataFrame:
    """The modification-dates subject: per-realm newest/oldest activity
    timestamps — the reference tracks per-realm dump downloaded/live
    times and serves them so callers can poll for staleness (S2's
    watermark, grouped per realm instead of one global max). One
    hash-agg keyed by realm; the region filter (when given) rides the
    broadcast dim."""
    ev = tables.load(spark, sf_dir, "events")
    cust = tables.load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_nationkey").alias("realm_id"),
    )
    # broadcast ONLY the realm dim (nation x region, ~25 rows) — the
    # customer-joined map is customer-SCALE, and broadcasting it OOMs
    # at the posture this module claims (r11 review finding). The
    # customer join stays a shuffle join for AQE to plan; the region
    # filter shrinks the dim BEFORE it touches customer.
    realms = _realm_dim(spark, sf_dir)
    if region_name is not None:
        realms = realms.filter(F.col("region_name") == region_name)
    dim = cust.join(F.broadcast(realms), "realm_id")
    return (
        ev.join(dim, "user_id")
        .groupBy("region_name", "realm_id", "realm_name")
        .agg(
            F.max("ts").alias("last_modified"),
            F.min("ts").alias("first_seen"),
            F.count("*").alias("n_events"),
        )
        .orderBy("region_name", "realm_id")
    )


def token_history(
    spark: SparkSession, sf_dir: str, region_name: str
) -> DataFrame:
    """The token-history subject: one region's daily token price
    series — exactly the W5 TokenHistory operator with the region
    predicate applied. The filter is on a grouping key, so Catalyst
    pushes it below the aggregate into the dimension scan; the served
    form IS the proven operator, parameterized."""
    from server_spark.queries.timeseries import w5_token_history

    return w5_token_history(spark, sf_dir).filter(
        F.col("region_name") == region_name
    )


def unmet_demand_list(
    spark: SparkSession,
    sf_dir: str,
    owner_cap: int = 10,
    limit: int = 100,
) -> DataFrame:
    """The unmet-demand subject: catalog items with zero live auctions
    from the watched owner set (J5's anti join), served as a
    deterministic, bounded list (distributed top-k, not a global
    sort)."""
    from server_spark.operators import joins

    items = tables.load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("item"), F.col("p_name").alias("item_name")
    )
    offered = (
        auctions(spark, sf_dir)
        .filter(F.col("owner") <= owner_cap)
        .select("item")
    )
    return (
        joins.unmet_demand(items, offered, "item")
        .orderBy("item")
        .limit(limit)
    )
