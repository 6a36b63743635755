"""Interchange formats beyond parquet (SURVEY.md §2.1 sources/sinks).

The reference's native formats are gzip-JSON dumps (sources/json_dump
.py) and its internal store; a warehouse engine additionally speaks
CSV (headered, compressed, schema-enforced — the lowest-common-
denominator export) and ORC (the other columnar format, for
interoperability with Hive-stack consumers). Both are thin wrappers
over the native Spark readers so predicate pushdown / column pruning
behavior is whatever the format supports: ORC prunes and pushes like
parquet; CSV always scans full rows — which is exactly why the
medallion keeps CSV/JSON at the bronze edge and converts to columnar
immediately (plans/medallion.py).

Malformed CSV rows follow the same degradation policy as the JSON
intake: PERMISSIVE parse with a ``_corrupt_record`` column so bad
exports land in quarantine instead of failing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from server_spark.schemas import AUCTION

CORRUPT_COL = "_corrupt_record"


def write_csv(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """Headered, compressed CSV export; timestamps in ISO-8601 so the
    roundtrip re-parses without a custom format string."""
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("compression", compression)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(path)
    )


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType = AUCTION
) -> DataFrame:
    """Schema-enforced CSV intake; malformed rows survive in
    ``_corrupt_record`` (quarantine pattern, not job failure)."""
    full = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = AUCTION
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_jsonl(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """Gzip JSON-lines export — the reference serves gzip JSON
    payloads, and JSONL is the interchange format downstream tokenizer
    / training-data consumers ingest. Timestamps ISO-8601 like the
    CSV path."""
    (
        df.write.mode("overwrite")
        .option("compression", compression)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .json(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType = AUCTION
) -> DataFrame:
    """Schema-enforced JSONL intake with the same corrupt-record
    quarantine as CSV."""
    full = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .json(path)
    )
