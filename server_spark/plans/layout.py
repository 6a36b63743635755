"""Multi-dimensional data layout: Z-order clustering for file/row-group
skipping (SURVEY.md §1.4 storage posture).

A table sorted on ONE column skips files well for predicates on that
column and not at all for any other. Interleaving the bits of two (or
more) key columns into a single Z-value and range-partition-sorting on
it gives every file a NARROW min/max envelope on EVERY participating
dimension — the layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER
BY`` — so parquet footer stats prune files for predicates on either
column, or both. At 100 TB this is the difference between a
two-predicate dashboard query reading ~1/√n_files of the data versus
all of it.

Everything here is JVM-side column arithmetic (shift/or loops unrolled
at plan-build time, whole-stage codegen) over a range partitioner —
no UDFs, no driver data paths except the per-column min/max bounds
(two scalars per column, the same stats any layout optimizer reads
from table metadata; computed with one tiny agg job here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16 bits per dimension: 65k distinct buckets per column is plenty of
# resolution for file-level clustering (a layout needs only ~n_files
# distinguishable key prefixes), and two dims fit losslessly in a long.
ZBITS = 16


def _bucketize(c: Column, cmin: float, cmax: float, bits: int) -> Column:
    """Min-max scale a numeric column onto the [0, 2^bits) integer
    grid. Monotonic, so Z-order locality follows value locality."""
    span = max(float(cmax) - float(cmin), 1e-12)
    scaled = (c.cast("double") - F.lit(float(cmin))) / F.lit(span)
    return F.least(
        F.greatest(
            F.floor(scaled * F.lit((1 << bits) - 1)).cast("long"), F.lit(0)
        ),
        F.lit((1 << bits) - 1),
    )


def morton2(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Interleave the low ``bits`` bits of two long columns: a's bit i
    lands at position 2i+1, b's at 2i. Pure shift/and/or terms —
    2*bits ors, unrolled at plan-build time so codegen sees one flat
    expression (no UDF). This is THE Morton kernel; zorder_key
    composes it with min-max bucketization (an earlier twin module,
    plans/zorder.py, carried an independent copy — r11 review
    finding; consolidated here so a bit-layout change lands once)."""
    code = F.lit(0).cast("long")
    for i in range(bits):
        code = code.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return code


def zorder_key(
    x: Column, y: Column, bounds: tuple[float, float, float, float],
    bits: int = ZBITS,
) -> Column:
    """Interleaved Morton key of two bucketized columns — see
    :func:`morton2` for the bit layout."""
    xmin, xmax, ymin, ymax = bounds
    return morton2(
        _bucketize(x, xmin, xmax, bits),
        _bucketize(y, ymin, ymax, bits),
        bits,
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 16,
    bits: int = ZBITS,
) -> tuple[float, float, float, float]:
    """Rewrite ``df`` as ``n_files`` parquet files clustered by the
    Z-order of (col_x, col_y); returns the bounds used (they are the
    layout's metadata — a reader pruning manually, or a later
    incremental write, needs the same grid).

    repartitionByRange on the Z-key gives each output file a
    contiguous Z-range (range partitioner, sampled boundaries);
    sortWithinPartitions tightens row-group stats inside each file.
    """
    row = df.agg(
        F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
    ).first()
    bounds = (float(row[0]), float(row[1]), float(row[2]), float(row[3]))
    z = zorder_key(F.col(col_x), F.col(col_y), bounds, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return bounds


def write_keysorted(
    df: DataFrame, path: str, col: str, n_files: int = 16
) -> None:
    """The single-key baseline layout: range-partition + sort on ONE
    column (what a naive gold write does) — the control arm for the
    file-skipping probes."""
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def files_touched(spark, path: str, predicate) -> tuple[int, int]:
    """(files contributing rows under ``predicate``, total files) —
    the end-to-end file-skipping measurement: with one file per range
    slice, the distinct input_file_name() count under a filter IS the
    number of files whose envelope intersects the predicate.
    Complements :func:`files_surviving`, which answers the same
    question from footer stats alone."""
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


def file_envelopes(path: str, col_x: str, col_y: str) -> list[dict]:
    """Per-file min/max envelope of both layout columns, read from the
    parquet footers — exactly the stats a scan planner prunes with."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet") or name.startswith(("_", ".")):
            continue
        md = pq.read_metadata(os.path.join(path, name))
        stats: dict[str, list[float]] = {col_x: [], col_y: []}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                nm = c.path_in_schema
                if nm in stats and c.statistics is not None:
                    stats[nm].append(
                        (float(c.statistics.min), float(c.statistics.max))
                    )
        if stats[col_x] and stats[col_y]:
            out.append(
                {
                    "file": name,
                    "x_min": min(a for a, _ in stats[col_x]),
                    "x_max": max(b for _, b in stats[col_x]),
                    "y_min": min(a for a, _ in stats[col_y]),
                    "y_max": max(b for _, b in stats[col_y]),
                }
            )
    return out


def files_surviving(
    envelopes: list[dict],
    x_range: tuple[float, float] | None = None,
    y_range: tuple[float, float] | None = None,
) -> int:
    """How many files a footer-stats pruner would read for a
    conjunctive range predicate — the layout's figure of merit."""

    def hits(e: dict) -> bool:
        if x_range and (e["x_max"] < x_range[0] or e["x_min"] > x_range[1]):
            return False
        if y_range and (e["y_max"] < y_range[0] or e["y_min"] > y_range[1]):
            return False
        return True

    return sum(1 for e in envelopes if hits(e))
