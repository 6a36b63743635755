"""Z-ORDER (Morton) clustering for multi-dimensional file skipping.

A gold table laid out by one sort key skips beautifully on that key
and not at all on the second predicate column — but marketplace reads
filter on (item) AND (realm), (item) AND (day), etc. Interleaving the
bits of both keys' normalized ranks (the Morton curve) gives every
file a TIGHT min/max envelope in BOTH dimensions, so footer-stats
pruning works for either predicate or their conjunction — the same
idea behind Delta/Iceberg Z-ordering, built here from plain Spark
primitives: a narrow bit-interleave expression, repartitionByRange on
the code, sortWithinPartitions, one file per range slice.

`scripts/probe_zorder.py` measures the effect directly (files touched
under 2D predicates, z-order vs single-key layout) instead of
asserting it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits per dimension; 2 dims -> 32-bit morton code


def _norm_rank(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Min-max normalize ``col`` into [0, 2^bits) as a long — rank by
    VALUE against broadcast bounds (no window, no sort): monotone, so
    morton locality is preserved; ties collapse, which only makes
    envelopes tighter."""
    span = (hi - lo).cast("double")
    scaled = F.when(
        span > 0,
        ((col - lo).cast("double") / span) * ((1 << bits) - 1),
    ).otherwise(F.lit(0.0))
    return F.floor(scaled).cast("long")


def morton2(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Interleave the low ``bits`` bits of two long columns:
    a's bit i lands at position 2i+1, b's at 2i — one narrow
    codegen-able expression (2*bits shift/mask terms, no UDF)."""
    code = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftleft(
            F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        bbit = F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i
        )
        code = code.bitwiseOR(abit).bitwiseOR(bbit)
    return code


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = ZBITS,
) -> None:
    """Write ``df`` as parquet clustered on the Morton code of
    (col_a, col_b): range-partition by the code (one file per slice),
    sort within partitions so row groups inherit tight envelopes.
    Bounds come from ONE tiny agg (broadcast scalars)."""
    bounds = df.agg(
        F.min(col_a).alias("a_lo"),
        F.max(col_a).alias("a_hi"),
        F.min(col_b).alias("b_lo"),
        F.max(col_b).alias("b_hi"),
    )
    coded = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_z",
        morton2(
            _norm_rank(
                F.col(col_a), F.col("a_lo"), F.col("a_hi"), bits
            ),
            _norm_rank(
                F.col(col_b), F.col("b_lo"), F.col("b_hi"), bits
            ),
        ),
    ).drop("a_lo", "a_hi", "b_lo", "b_hi")
    (
        coded.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_keysorted(
    df: DataFrame, path: str, col: str, n_files: int = 16
) -> None:
    """The single-key baseline layout: range-partition + sort on ONE
    column (what a naive gold write does)."""
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def files_touched(spark, path: str, predicate) -> tuple[int, int]:
    """(files contributing rows under ``predicate``, total files) —
    the file-skipping measurement: with one file per range slice, the
    distinct input_file_name() count under a filter IS the number of
    files whose envelope intersects the predicate."""
    df = spark.read.parquet(path)
    total = (
        df.select(F.input_file_name().alias("f")).distinct().count()
    )
    touched = (
        df.filter(predicate)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    return touched, total
