"""Explicit StructType schemas for every table the engine reads.

The reference fixes all schemas at compile time via Go struct JSON tags
(SURVEY.md §1.3 — `app/pkg/sotah/*.go`, `app/pkg/blizzard/*.go` [M]);
we mirror that discipline: production reads NEVER rely on schema
inference. Two schema families live here:

1. The driver's synthetic TPC-H-ish tables (FIXTURES.md §2, verified
   against the parquet footers) — what tests and the oracle run on.
2. The domain schemas of the reference (auction dump, item, realm
   status) — used by the medallion pipeline (plans/) and streaming
   demos, mirroring `app/pkg/blizzard/auction.go` [M].
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# 1. Synthetic harness tables (exact parquet schemas, FIXTURES.md §2)
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

# Legacy raw shape for events when the harness parquet encoded ts as
# int64 TIMESTAMP(NANOS) (rounds 1-2). The current testdata is native
# timestamp[us]; tables.events_ts_kind sniffs the footer and picks the
# right reader, so both encodings keep working.
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# Shape of the JSON carried in events.props (verified sample: {"k": 69}).
EVENT_PROPS = T.StructType([T.StructField("k", T.LongType())])

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ---------------------------------------------------------------------------
# 2. Reference-domain schemas (medallion pipeline / streaming demos)
# ---------------------------------------------------------------------------

# Raw Blizzard auction row — mirrors `app/pkg/blizzard/auction.go` [M]:
# {auc, item, owner, ownerRealm, bid, buyout, quantity, timeLeft, ...}.
AUCTION = T.StructType(
    [
        T.StructField("auc", T.LongType()),
        T.StructField("item", T.LongType()),
        T.StructField("owner", T.StringType()),
        T.StructField("owner_realm", T.StringType()),
        T.StructField("bid", T.LongType()),
        T.StructField("buyout", T.LongType()),
        T.StructField("quantity", T.LongType()),
        T.StructField("time_left", T.StringType()),
        # ingestion metadata added by the intake (not in the raw dump)
        T.StructField("region", T.StringType()),
        T.StructField("realm_slug", T.StringType()),
        T.StructField("dump_ts", T.TimestampType()),
    ]
)

# Collapsed "mini-auction" — `app/pkg/sotah/miniauction.go` [M]: group
# key + the list of collapsed auction ids + count.
MINI_AUCTION = T.StructType(
    [
        T.StructField("item", T.LongType()),
        T.StructField("owner", T.StringType()),
        T.StructField("owner_realm", T.StringType()),
        T.StructField("bid", T.LongType()),
        T.StructField("buyout", T.LongType()),
        T.StructField("buyout_per", T.DoubleType()),
        T.StructField("quantity", T.LongType()),
        T.StructField("time_left", T.StringType()),
        T.StructField("auc_list", T.ArrayType(T.LongType())),
        T.StructField("auc_count", T.LongType()),
    ]
)

# Per-item price stats — `app/pkg/sotah/pricelist.go` NewPriceList [M].
PRICES = T.StructType(
    [
        T.StructField("item", T.LongType()),
        T.StructField("min_buyout_per", T.DoubleType()),
        T.StructField("max_buyout_per", T.DoubleType()),
        T.StructField("average_buyout_per", T.DoubleType()),
        T.StructField("median_buyout_per", T.DoubleType()),
        T.StructField("volume", T.LongType()),
    ]
)

# Item dimension — `app/pkg/sotah/item.go` [M] (subset that matters).
ITEM = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("normalized_name", T.StringType()),
        T.StructField("quality", T.IntegerType()),
        T.StructField("item_class", T.IntegerType()),
        T.StructField("icon", T.StringType()),
    ]
)

# Realm status hierarchy — `app/pkg/blizzard/status.go` [M].
REALM_STATUS = T.StructType(
    [
        T.StructField("region", T.StringType()),
        T.StructField(
            "realms",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("slug", T.StringType()),
                        T.StructField("name", T.StringType()),
                        T.StructField("timezone", T.StringType()),
                        T.StructField(
                            "connected_realms", T.ArrayType(T.StringType())
                        ),
                    ]
                )
            ),
        ),
        T.StructField("last_modified", T.TimestampType()),
    ]
)
