"""Codec and incremental-scan queries (SURVEY.md §2.8 F9, §2.1 S2).

F9 — the reference gzips+base64s every NATS payload and Bolt value
(`app/pkg/util/gzip.go`, messenger codecs [M]). Parquet compression
replaces gzip for storage; base64 survives as a transport codec at
the serving edge.

S2 — the lastModified watermark poll: batch form is "rows newer than
the stored high-water mark", expressed as a filter against a scalar
aggregate (no driver-side collect — the watermark is a broadcast
scalar in the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server_spark import tables
from server_spark.registry import register


@register(
    "f9_base64_codec",
    """
    SELECT doc_id,
           to_base64(encode(text)) AS payload_b64,
           octet_length(from_base64(to_base64(encode(text)))) AS decoded_bytes
    FROM documents
    """,
    doc="F9 — base64 transport codec round-trip over document payloads "
    "(the NATS payload encoding surface; gzip itself is superseded by "
    "parquet compression).",
    tags=("function", "codec"),
)
def f9_base64_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    # Spark's base64 is the MIME variant (CRLF every 76 chars); strip
    # the line breaks for the canonical unchunked form DuckDB emits.
    b64 = F.regexp_replace(
        F.base64(F.encode(F.col("text"), "UTF-8")), "\r\n", ""
    )
    return docs.select(
        "doc_id",
        b64.alias("payload_b64"),
        F.octet_length(F.unbase64(b64)).cast("long").alias("decoded_bytes"),
    )


@register(
    "s2_incremental_scan",
    """
    SELECT event_id, ts, user_id, event_type
    FROM events
    WHERE ts > (SELECT MAX(ts) - INTERVAL 5 DAY FROM events)
    """,
    doc="S2 — lastModified watermark scan, batch form: only rows newer "
    "than the high-water mark (scalar-aggregate filter; becomes "
    "partition pruning when ts is a partition column).",
    tags=("scan", "incremental"),
)
def s2_incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    wm = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 5 DAYS")).alias("wm")
    )
    return (
        ev.join(F.broadcast(wm))
        .filter(F.col("ts") > F.col("wm"))
        .select("event_id", "ts", "user_id", "event_type")
    )
