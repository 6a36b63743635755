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
    from server_spark.barrier import barrier

    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    # Stamp the range-partition id in the stage right after the range
    # exchange: pid order == global key order by construction. The
    # stamped relation is BARRIERED because two branches consume it
    # (local ranks + per-partition counts): without materialization,
    # AQE may coalesce the range exchange DIFFERENTLY per consumer
    # (each branch is its own stage shape), and spark_partition_id()
    # then disagrees between the branches — offsets join against the
    # wrong pids and ranks silently shift (caught by the config-
    # metamorphic suite on the sibling grouped_cum_before).
    # eager=False (r15, guide §5 job-count pass): pid consistency only
    # needs both branches to read ONE RDD — the lazy checkpoint pins a
    # single physical-plan instance (one AQE decision, fixed partition
    # structure) exactly like the eager one, and the final action
    # materializes it without the extra serial job per call.
    staged = barrier(
        ranged.withColumn("_pid", F.spark_partition_id()), eager=False
    )

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


def grouped_cum_before(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    weight_col: str,
    out_col: str = "cum_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` + the EXCLUSIVE weighted prefix sum of ``weight_col``
    over ``order_col`` within each group — the cumulative-count-below
    primitive behind midranks (a50 Spearman), exact quantiles, and
    ECDFs — computed with the same two-phase shape as
    :func:`global_row_number` instead of one window task per group.

    A ``SUM(w) OVER (PARTITION BY g ORDER BY v ROWS ... 1 PRECEDING)``
    plans every group into ONE task; with few groups (a50 has 4) and
    10⁷+ distinct values per group at scale, that is a single-task
    serialization point. Here the relation is range-partitioned by
    (group, order), each partition prefix-sums locally in parallel,
    and per-(group, partition) totals — a relation bounded by
    ``groups × num_partitions``, FIXED by config, hence legally
    force-broadcast — shift the local sums to global ones.

    ``df`` must have UNIQUE (group_cols, order_col) rows (aggregate
    first) so a value's weight can never straddle a range boundary.
    """
    from server_spark.barrier import barrier

    keys = [*group_cols, order_col]
    ranged = (
        df.repartitionByRange(num_partitions, *keys)
        if num_partitions
        else df.repartitionByRange(*keys)
    )
    # barriered for the same reason as global_row_number: the offsets
    # branch and the local-prefix branch must observe the SAME
    # partition ids, and AQE may otherwise coalesce the range exchange
    # differently per consumer (observed: a50 under AQE-on returned a
    # wrong rho at sf0.001 — offsets joined against shifted pids).
    # eager=False: one shared RDD gives the same pid pinning without
    # the extra serial materialization job (see global_row_number).
    staged = barrier(
        ranged.withColumn("_pid", F.spark_partition_id()), eager=False
    )
    # per-(group, pid) totals → exclusive prefix over pid order within
    # the group; pid order == order_col order by range construction
    counts = staged.groupBy(*group_cols, "_pid").agg(
        F.sum(weight_col).alias("_cnt")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = counts.select(
        *group_cols,
        "_pid",
        (F.sum("_cnt").over(w_off) - F.col("_cnt")).alias("_off"),
    )
    w_local = (
        Window.partitionBy(*group_cols, "_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        staged.withColumn(
            "_local",
            F.coalesce(F.sum(weight_col).over(w_local), F.lit(0)),
        )
        .join(F.broadcast(offsets), [*group_cols, "_pid"])
        .withColumn(out_col, F.col("_off") + F.col("_local"))
        .drop("_pid", "_local", "_off")
    )


def ranked_with_count(
    df: DataFrame,
    group_cols: list[str],
    order_col: str | Column,
    rn: str = "rn",
    n: str = "n",
) -> DataFrame:
    """Append a per-group rank and group size in ONE window
    partitioning — the substrate of the exact rank-and-average-middles
    median (a2/a2d/a14/a31). The follow-up groupBy on the same keys
    reuses the hash partitioning: single shuffle, no self-join."""
    w = Window.partitionBy(*group_cols)
    return df.select(
        "*",
        F.row_number().over(w.orderBy(order_col)).alias(rn),
        F.count("*").over(w).alias(n),
    )


def mid_ranks(rn: str | Column = "rn", n: str | Column = "n") -> Column:
    """The middle-rank predicate of the exact median: ranks
    floor((n+1)/2) and floor((n+2)/2) — one row for odd n, the two
    middles for even n, so avg(when(mid_ranks(), value)) IS the
    median. ONE spelling shared by every exact-median query (a2, a2d,
    a14, a31) and mirrored verbatim in their oracle SQL (r11 review
    finding: four inline copies of the rule risked drifting one at a
    time in a codebase whose premise is one shared median contract)."""
    rn = F.col(rn) if isinstance(rn, str) else rn
    n = F.col(n) if isinstance(n, str) else n
    return (rn == F.floor((n + 1) / 2)) | (rn == F.floor((n + 2) / 2))
