"""Scalar-function and search queries (SURVEY.md §2.8 F1–F10, O3/W5).

The reference's search path (`app/pkg/database/` items/owners query
[M]) lowercases names, substring-filters, ranks with a fuzzy matcher,
and truncates to 10. Here: F1 normalization, F2 substring candidate
filter, F3 levenshtein ranking (the oracle-checkable score; exact
RankMatchFold parity lives in functions/text.py as a pandas_udf,
rows-only), F6 time codecs, F8 JSON extraction, F10 array ops.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server_spark import tables
from server_spark.parity import r4, r4sql
from server_spark.registry import auctions_sql, register

SEARCH_SUBSTR = "wid"       # substring query against part names
SEARCH_FUZZY = "old widget"  # fuzzy query string


@register(
    "f1_normalize_names",
    """
    SELECT p_partkey AS item, LOWER(TRIM(p_name)) AS normalized_name
    FROM part
    """,
    doc="F1 — item-name normalization (the NormalizedName the "
    "reference precomputes for search).",
    tags=("function", "search"),
)
def f1_normalize_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("item"),
        F.lower(F.trim(F.col("p_name"))).alias("normalized_name"),
    )


@register(
    "f2_substring_search",
    f"""
    SELECT p_partkey AS item, p_name AS item_name
    FROM part
    WHERE contains(LOWER(p_name), '{SEARCH_SUBSTR}')
    """,
    doc="F2 — substring candidate filter (strings.Contains on "
    "lowercased names).",
    tags=("function", "search"),
)
def f2_substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tables.load(spark, sf_dir, "part")
        .filter(F.lower(F.col("p_name")).contains(SEARCH_SUBSTR))
        .select(F.col("p_partkey").alias("item"), F.col("p_name").alias("item_name"))
    )


@register(
    "f3_levenshtein_rank",
    f"""
    SELECT p_partkey AS item, p_name AS item_name,
           levenshtein(LOWER(p_name), '{SEARCH_FUZZY}') AS rank
    FROM part
    ORDER BY rank, item
    LIMIT 10
    """,
    doc="F3/O3/W5 — fuzzy search ranking: levenshtein distance on "
    "normalized names, top-10 with unique tiebreak (the "
    "RankMatchFold-shaped query; exact Go-library parity is the "
    "pandas_udf in functions/text.py).",
    tags=("function", "search"),
)
def f3_levenshtein_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = tables.load(spark, sf_dir, "part")
    return (
        part.select(
            F.col("p_partkey").alias("item"),
            F.col("p_name").alias("item_name"),
            F.levenshtein(F.lower(F.col("p_name")), F.lit(SEARCH_FUZZY)).alias(
                "rank"
            ),
        )
        .orderBy(F.col("rank").asc(), F.col("item").asc())
        .limit(10)
    )


@register(
    "f6_time_codecs",
    """
    SELECT event_id,
           CAST(epoch_us(ts) // 1000000 AS BIGINT) AS unix_s,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_ts,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_of_day
    FROM events
    """,
    doc="F6 — unix-ts ↔ time codecs: epoch seconds, day truncation, "
    "hour extraction (the Bolt key codec surface).",
    tags=("function", "timeseries"),
)
def f6_time_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_timestamp("ts").alias("unix_s"),
        F.date_trunc("day", F.col("ts")).alias("day_ts"),
        F.hour("ts").cast("long").alias("hour_of_day"),
    )


@register(
    "f8_json_extract_agg",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           COUNT(*) AS n,
           COUNT(DISTINCT event_id) AS n_events,
           {V} AS avg_value
    FROM events
    GROUP BY 1
    """.format(V=r4sql("AVG(value)")),
    doc="F8 — JSON decode of the props payload feeding a relational "
    "plan: get_json_object extraction (the encoding/json surface) "
    "grouped and aggregated, all inside whole-stage codegen — no "
    "Python UDF.",
    tags=("function", "json"),
)
def f8_json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from server_spark.parity import r4

    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("long").alias("k"),
            "event_id",
            "value",
        )
        .groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("event_id").alias("n_events"),
            r4(F.avg("value")).alias("avg_value"),
        )
    )


@register(
    "f11_map_access",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys
    FROM events
    """,
    doc="F11 — MapType access: props parsed into a real "
    "map<string,long> (from_json), then key lookup, cardinality and "
    "sorted key enumeration — the typed-map surface the reference's "
    "ItemsMap/realm maps expose (SURVEY.md §1 map-vs-row note: "
    "long-table joins remain the RELATIONAL form; this is the "
    "column-typed form).",
    tags=("function", "map"),
    late=True,
)
def f11_map_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        m["k"].alias("k_value"),
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys"),
    )


@register(
    "f10_array_ops",
    auctions_sql(
        """
        SELECT owner,
               array_to_string(list_sort(list(DISTINCT item)), ',') AS item_ids,
               CAST(len(list(DISTINCT item)) AS INT) AS n_items,
               CAST(list_sort(list(DISTINCT item))[1] AS BIGINT) AS first_item
        FROM auctions
        GROUP BY owner
        """
    ),
    doc="F10 — array ops on collected lists: collect_set, sort, size, "
    "element access (the aucList manipulation surface).",
    tags=("function", "array"),
)
def f10_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from server_spark.sources.synthetic import auctions

    # ONE collect_set aggregate, array ops as a post-projection — the
    # single-shuffle intent is explicit in the plan (Catalyst dedupes
    # repeated aggregates anyway, but this doesn't rely on it).
    arr = F.array_sort(F.col("_items"))
    return (
        auctions(spark, sf_dir)
        .groupBy("owner")
        .agg(F.collect_set("item").alias("_items"))
        .select(
            "owner",
            F.array_join(
                F.transform(arr, lambda x: x.cast("string")), ","
            ).alias("item_ids"),
            F.size(arr).alias("n_items"),
            F.element_at(arr, 1).alias("first_item"),
        )
    )


# ---------------------------------------------------------------------------
# F12 — grouped-aggregate pandas UDF (true UDAF)
# ---------------------------------------------------------------------------


@register(
    "f12_geomean_udaf",
    auctions_sql(
        """
    SELECT owner,
           CAST(COUNT(*) AS BIGINT) AS n,
           {G} AS geo_mean_buyout
    FROM auctions
    WHERE buyout > 0
    GROUP BY owner
    """.replace("{G}", r4sql("EXP(AVG(LN(CAST(buyout AS DOUBLE))))"))
    ),
    doc="F12 — the UDAF slot of the UDF family (D-rows): per-owner "
    "geometric-mean buyout as a GROUPED_AGG pandas_udf — Arrow-"
    "batched per group, the Spark-Python form of a custom aggregate "
    "(scalar pandas_udf = D2/f3b, UDTF = D7/x13 complete the "
    "trio). Numerically via mean-of-logs (no overflow), and the "
    "oracle runs the identical EXP(AVG(LN)) so both engines share "
    "one summation contract. At scale GROUPED_AGG skips the "
    "partial-agg path (full shuffle of group rows) — fine for "
    "bounded groups; a built-in composition is preferred where one "
    "exists (this one exists: exp(avg(ln)) — the UDF is the "
    "demonstration of the slot, not the recommended plan).",
    tags=("function", "udaf", "pandas"),
    late=True,
)
def f12_geomean_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    # NB: with ``from __future__ import annotations`` in force the
    # hints are strings; pandas_udf resolves them via the function's
    # module globals — hence the module-level pandas import.
    @pandas_udf("double")
    def geo_mean(buyout: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(buyout.astype("float64")).mean()))

    # a GROUPED_AGG UDF cannot share an agg with built-in aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — the count is a second UDAF
    @pandas_udf("long")
    def n_rows(buyout: pd.Series) -> int:
        return len(buyout)

    from server_spark.sources.synthetic import auctions

    aucs = auctions(spark, sf_dir).filter(F.col("buyout") > 0)
    return aucs.groupBy("owner").agg(
        n_rows("buyout").alias("n"),
        r4(geo_mean("buyout")).alias("geo_mean_buyout"),
    )


# ---------------------------------------------------------------------------
# F13 — VARIANT semi-structured payloads (parse once, typed access)
# ---------------------------------------------------------------------------


@register(
    "f13_variant_payload",
    f"""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
               AS k_bucket,
           COUNT(*) AS n,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS BIGINT) AS k_min,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS BIGINT) AS k_max,
           {r4sql("SUM(value)")} AS total_value
    FROM events
    GROUP BY 1
    """,
    doc="F13 — the VARIANT path for semi-structured payloads: "
    "parse_json once into Spark's binary VARIANT encoding, then "
    "typed variant_get accesses (no re-parse per field, unlike "
    "get_json_object which re-reads the string each call — the "
    "reason VARIANT is the 100 TB semi-structured format: shredded "
    "binary storage + O(1) typed field access). Relational plan "
    "downstream is a plain hash-agg. Oracle: DuckDB JSON extraction "
    "of the same fields.",
    tags=("function", "json", "variant"),
    late=True,
)
def f13_variant_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    parsed = ev.select(
        F.parse_json("props").alias("v"), "value"
    ).select(
        F.variant_get("v", "$.k", "bigint").alias("k"), "value"
    )
    return parsed.groupBy((F.col("k") % 10).alias("k_bucket")).agg(
        F.count("*").alias("n"),
        F.min("k").cast("long").alias("k_min"),
        F.max("k").cast("long").alias("k_max"),
        r4(F.sum("value")).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# F14 — higher-order array functions (lambda surface over collected lists)
# ---------------------------------------------------------------------------

_F14_OWNERS = 25
_F14_BIG = 5000.0


@register(
    "f14_array_hof",
    auctions_sql(
        f"""
        , per_owner AS (
            SELECT owner, list_sort(list(buyout)) AS prices
            FROM auctions WHERE owner <= {_F14_OWNERS}
            GROUP BY owner
        )
        SELECT owner,
               len(prices) AS n_prices,
               len(list_filter(prices, x -> x > {_F14_BIG})) AS n_big,
               {r4sql(f"list_sum(list_transform(prices, x -> x * 0.95))")}
                   AS fee_adjusted_total,
               {r4sql("list_sum(prices[1:3])")} AS cheapest3_sum
        FROM per_owner
        ORDER BY owner
        """
    ),
    doc="F14 — the HIGHER-ORDER-FUNCTION surface as a named query: "
    "per-owner price lists manipulated with lambda builtins — "
    "filter(x -> x > t) for threshold counting, transform + aggregate "
    "for a fee-adjusted total, slice + aggregate for a cheapest-k "
    "sum — all evaluated INSIDE whole-stage codegen on the JVM, the "
    "idiomatic Spark replacement for every per-row Python loop the "
    "reference runs over its aucList arrays (x3/x22/x74 use the same "
    "primitives inside similarity kernels; this query pins the "
    "surface itself against DuckDB's list_* lambda family). Arrays "
    "are sorted before any float fold so both engines reduce in the "
    "identical order.",
    tags=("function", "array", "hof"),
    late=True,
)
def f14_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from server_spark.sources.synthetic import auctions

    per_owner = (
        auctions(spark, sf_dir)
        .filter(F.col("owner") <= _F14_OWNERS)
        .groupBy("owner")
        .agg(F.array_sort(F.collect_list("buyout")).alias("prices"))
    )
    fee_total = F.aggregate(
        F.transform(F.col("prices"), lambda x: x * 0.95),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cheap3 = F.aggregate(
        F.slice(F.col("prices"), 1, 3), F.lit(0.0), lambda acc, x: acc + x
    )
    return per_owner.select(
        "owner",
        F.size("prices").alias("n_prices"),
        F.size(
            F.filter(F.col("prices"), lambda x: x > _F14_BIG)
        ).alias("n_big"),
        r4(fee_total).alias("fee_adjusted_total"),
        r4(cheap3).alias("cheapest3_sum"),
    ).orderBy("owner")
