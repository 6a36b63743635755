"""Time-series / window / streaming-shaped operators (SURVEY.md §2.5,
§2.9). The reference's history machinery is BoltDB buckets keyed by
unix ts (`app/pkg/database/database_pricelisthistories.go` [M]); here
a time series is just a long DataFrame and every history operation is
a window or bucketed aggregation.

Scale posture: bucketing uses `date_trunc` (pure projection — no
shuffle until the agg); per-entity windows partition by the entity key
so state never concentrates on one executor; retention is a partition-
prunable predicate, not a rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucket(df: DataFrame, ts: str, unit: str) -> Column:
    """W1/T3 — tumbling-window key via date_trunc (hour/day/...)."""
    return F.date_trunc(unit, F.col(ts))


def bucketed_stats(
    df: DataFrame, ts: str, unit: str, keys: list[str], value: str
) -> DataFrame:
    """W1/W2 — one stats row per (entity, bucket): the pricelist-
    history append re-expressed as a grouped aggregation."""
    return (
        df.groupBy(*keys, bucket(df, ts, unit).alias("bucket_ts"))
        .agg(
            F.count("*").alias("n"),
            F.min(value).alias("min_value"),
            F.max(value).alias("max_value"),
            F.avg(value).alias("avg_value"),
            F.sum(value).alias("sum_value"),
        )
    )


def lag_delta(
    series: DataFrame, keys: list[str], ts: str, value: str
) -> DataFrame:
    """W3 — per-entity delta vs previous bucket (price trend)."""
    w = Window.partitionBy(*keys).orderBy(ts)
    prev = F.lag(value).over(w)
    return series.withColumn("prev_value", prev).withColumn(
        "delta", F.col(value) - prev
    )


def moving_avg(
    series: DataFrame, keys: list[str], ts: str, value: str, width: int
) -> DataFrame:
    """W4 — trailing moving average over the last ``width`` buckets."""
    w = Window.partitionBy(*keys).orderBy(ts).rowsBetween(-(width - 1), 0)
    return series.withColumn("moving_avg", F.avg(value).over(w))


def watermark_dedup(
    df: DataFrame, keys: list[str], order: list[Column]
) -> DataFrame:
    """T2 — keep exactly one row per key, chosen by a deterministic
    order (the batch form of the reference's lastModified-watermark
    skip). `row_number`=1, never `dropDuplicates` (whose survivor is
    partition-order dependent)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def sessionize(
    df: DataFrame, key: str, ts: str, gap_minutes: int
) -> DataFrame:
    """T4 — session windows via gaps-and-islands: a new session starts
    when the gap from the previous event exceeds ``gap_minutes``.

    Expressed with lag + cumulative sum (identical SQL exists for the
    DuckDB oracle); Spark's native ``session_window`` gives the same
    buckets but isn't oracle-expressible verbatim.
    """
    w = Window.partitionBy(key).orderBy(ts, "event_id")
    gap = F.col(ts).cast("long") - F.lag(F.col(ts).cast("long")).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    sess = df.withColumn(
        "session_id", F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
    )
    return sess.groupBy(key, "session_id").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count("*").alias("n_events"),
    )


def retention_filter(df: DataFrame, ts: str, cutoff) -> DataFrame:
    """P7/T7 — RetentionLimit pruning: at scale this predicate lands on
    a date partition column and becomes partition pruning, the exact
    analog of the reference deleting expired Bolt keys."""
    return df.filter(F.col(ts) >= cutoff)
