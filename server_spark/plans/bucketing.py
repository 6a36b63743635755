"""Bucketed (pre-shuffled) tables for co-located joins (SCALE.md).

At 100 TB the dominant cost of a fact-to-fact join is the shuffle of
both sides. Writing the recurring join inputs bucketed on the join
key — `bucketBy(n, key)` + `sortBy(key)` — pays that shuffle ONCE at
write time; every subsequent join between tables bucketed on the same
key with the same bucket count plans as a zero-exchange sort-merge
join over matching buckets (verified by tests/test_plans.py).

This is the batch analog of co-partitioned Kafka topics: the
snapshot-churn family (J3/U1–U3) re-joins consecutive auction
snapshots on auc every hour — exactly the recurring join this layout
serves. Bucket count is a layout constant (like partition count,
pick ~data/bucket ≤ target task size); both sides MUST agree on it.

Bucketing requires the table catalog (`saveAsTable`) because bucket
metadata lives in the catalog, not the parquet footer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Persist ``df`` hash-bucketed and sorted on ``key``."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-key same-count bucketed tables; with bucketed
    scans enabled Catalyst plans NO exchange on either side."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, key)
