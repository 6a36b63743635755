"""Distributed global ranking without a single-partition sort.

A global ``ROW_NUMBER() OVER (ORDER BY ...)`` plans as one window over
ONE partition — the whole relation funnels through a single task,
which is exactly the shape that cannot survive a 100× scale-up. The
scalable equivalent is the textbook two-phase rank:

1. range-partition by the sort key (Spark's sampled RangePartitioner —
   the same exchange a global ``orderBy`` uses, but WITHOUT collapsing
   to one partition afterwards);
2. rank locally within each range partition;
3. shift each partition's local ranks by the cumulative row count of
   the partitions before it (a partition-count relation — tens of
   rows — so its prefix-sum window is trivially single-node).

Total cost: two narrow shuffles of the key columns; no stage ever
holds more than one range slice. Used by x31_length_batching; the
order columns must form a TOTAL order (include a unique tiebreak) for
the result to be deterministic and engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` + a 1-based global rank column over ``order_cols``,
    computed with range partitioning instead of a global sort."""
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    # Stamp the range-partition id in the stage right after the range
    # exchange: pid order == global key order by construction.
    staged = ranged.withColumn("_pid", F.spark_partition_id())

    # Per-partition row counts → exclusive prefix sum. This relation
    # has one row per partition; the unpartitioned window here is a
    # deliberate tiny-relation sort, not a data-volume sort.
    counts = staged.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    from server_spark.operators.windows import pinned_single_group

    w_off = (
        # pinned single group: bounded window (one row per partition),
        # not a data sort
        Window.partitionBy(pinned_single_group("_pid"))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = counts.select(
        "_pid", (F.sum("_cnt").over(w_off) - F.col("_cnt")).alias("_off")
    )

    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        staged.withColumn("_local_rn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_local_rn")))
        .drop("_pid", "_local_rn", "_off")
    )
