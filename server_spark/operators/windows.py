"""Window helpers shared by the query modules."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pinned_single_group(col: str | Column) -> Column:
    """A partition key that puts every row in ONE group without
    tripping WindowExec's "No Partition Defined" warning.

    Semantically global windows over BOUNDED relations (day-level
    series, post-limit top-K, per-partition counts) are safe, but at
    scale their log warnings are indistinguishable from a real
    all-data global window. ``partitionBy(lit(1))`` does NOT help —
    the optimizer strips foldable keys and the spec ends up empty
    again; ``col * 0`` survives over some inputs but is stripped over
    aggregates (both verified on optimized plans). ``pmod(xxhash64(c),
    1)`` is always 0, never null (xxhash64 hashes nulls), opaque to
    arithmetic simplification, and costs one hash per row — exactly
    the explicit single-group exchange we mean.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(1))
