"""Weighted isotonic regression (pool-adjacent-violators) per group.

The monotone-constrained least-squares fit: given per-group points
(x, y, w), find the y-values ŷ minimizing Σ w(y−ŷ)² subject to ŷ
nonincreasing (or nondecreasing) in x. The classic PAVA algorithm is
inherently sequential IN x within a group — exactly the shape for
``applyInPandas``: groups scale out across executors, the sequential
scan runs over each group's (bounded) distinct-x points.

Scale posture: callers MUST pre-aggregate to one row per (group, x)
(a map-combined hash-agg), so the pandas group is bounded by the
DISTINCT x count per group (e.g. stack sizes ≤ ~200), never by raw
row count. PAVA itself is O(points) amortized — the stack never pops
more than it pushed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def isotonic_fit(
    df: DataFrame,
    keys: list[str],
    x: str,
    y: str,
    w: str,
    increasing: bool = True,
    out_col: str = "fitted",
) -> DataFrame:
    """``df`` (one row per (keys, x) — pre-aggregated) plus the
    monotone least-squares fit of ``y`` on ``x`` weighted by ``w``."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    # copy the field list — StructType.add MUTATES the receiver, which
    # would graft out_col onto df.schema itself
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )
    inc = increasing

    def fit(pdf):
        # helper logic inlined so the closure pickles by value and the
        # UDF works regardless of the driver's working directory
        pdf = pdf.sort_values(x, kind="mergesort").reset_index(drop=True)
        blocks = []
        for yi, wi in zip(pdf[y], pdf[w]):
            blocks.append([float(yi), float(wi), 1])
            while len(blocks) > 1:
                v1, w1, c1 = blocks[-2]
                v2, w2, c2 = blocks[-1]
                if (v2 >= v1) == inc and v1 != v2:
                    break
                blocks.pop()
                blocks.pop()
                tw = w1 + w2
                blocks.append([(v1 * w1 + v2 * w2) / tw, tw, c1 + c2])
        fitted = []
        for v, _, c in blocks:
            fitted.extend([v] * c)
        return pdf.assign(**{out_col: fitted})

    return df.groupBy(*keys).applyInPandas(fit, schema=schema)
