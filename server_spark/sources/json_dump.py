"""Raw auction-dump ingestion: the reference's literal input format
(SURVEY.md §2.1 S1 — gzip JSON documents fetched from the Blizzard
API and archived verbatim, `app/pkg/blizzard/auction.go` [M]).

A dump file is ONE JSON document ``{"realms": [...], "auctions":
[{auc, item, owner, ownerRealm, bid, buyout, quantity, timeLeft},
...]}``, usually gzip-compressed. Spark reads ``.gz`` transparently;
``multiLine=true`` parses whole-document JSON (one doc per file —
exactly the dump-per-realm cadence). Schemas are EXPLICIT: production
never schema-infers (a malformed dump must surface as nulls in known
columns, not silently reshape the table).

Scale note: gzip is not splittable — one dump = one task, which
matches the per-realm dump granularity (thousands of small files, not
one huge one). The very first thing ingestion does is rewrite into
partitioned parquet (plans/medallion.ingest_bronze), so nothing
downstream ever re-reads JSON.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Raw wire-format row (camelCase as in the API payload).
RAW_AUCTION = T.StructType(
    [
        T.StructField("auc", T.LongType()),
        T.StructField("item", T.LongType()),
        T.StructField("owner", T.StringType()),
        T.StructField("ownerRealm", T.StringType()),
        T.StructField("bid", T.LongType()),
        T.StructField("buyout", T.LongType()),
        T.StructField("quantity", T.LongType()),
        T.StructField("timeLeft", T.StringType()),
    ]
)

# Whole dump document.
RAW_DUMP = T.StructType(
    [
        T.StructField(
            "realms",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("slug", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("auctions", T.ArrayType(RAW_AUCTION)),
    ]
)


def read_realm_status(spark: SparkSession, path: str):
    """Parse realm-status documents (schemas.REALM_STATUS — the
    region→realms→connected_realms nesting of
    `app/pkg/blizzard/status.go` [M]) into one flat row per
    (region, realm, connected realm): the two-level explode J2's
    hierarchy queries start from. Realms with no connected list keep
    one row (null connection) so the realm itself never drops out."""
    from server_spark.schemas import REALM_STATUS

    doc = spark.read.schema(REALM_STATUS).option("multiLine", "true").json(path)
    realms = doc.select(
        "region", "last_modified", F.explode("realms").alias("realm")
    )
    return realms.select(
        "region",
        F.col("realm.slug").alias("realm_slug"),
        F.col("realm.name").alias("realm_name"),
        F.col("realm.timezone").alias("timezone"),
        F.explode_outer("realm.connected_realms").alias("connected_realm"),
        "last_modified",
    )


def read_auction_dump(
    spark: SparkSession,
    path: str,
    region: str,
    dump_ts: str,
) -> DataFrame:
    """Parse one or more (gzip) JSON dump files into the canonical
    AUCTION shape (schemas.AUCTION): explode the auctions array,
    snake_case the wire names, attach intake metadata. The realm slug
    comes from the dump's own realms header (first entry — a dump is
    per connected-realm group)."""
    doc = spark.read.schema(RAW_DUMP).option("multiLine", "true").json(path)
    return (
        doc.select(
            F.element_at("realms", 1)["slug"].alias("realm_slug"),
            F.explode("auctions").alias("a"),
        )
        .select(
            F.col("a.auc").alias("auc"),
            F.col("a.item").alias("item"),
            F.col("a.owner").alias("owner"),
            F.col("a.ownerRealm").alias("owner_realm"),
            F.col("a.bid").alias("bid"),
            F.col("a.buyout").alias("buyout"),
            F.col("a.quantity").alias("quantity"),
            F.col("a.timeLeft").alias("time_left"),
            F.lit(region).alias("region"),
            "realm_slug",
            F.lit(dump_ts).cast("timestamp").alias("dump_ts"),
        )
    )
