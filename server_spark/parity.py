"""Cross-engine float canonicalization for oracle comparison.

Spark's ``round()`` rounds the exact binary double (Java BigDecimal
HALF_UP on the binary value) while DuckDB's ``ROUND`` behaves like
rounding the shortest decimal representation — e.g. the double
1730.9467499999998 rounds to 1730.9467 in Spark but 1730.9468 in
DuckDB. Since order-dependent float aggregation also wobbles in the
last ulps, every double-typed aggregate that crosses the oracle
boundary is canonicalized the same way on BOTH sides:

    snap to DECIMAL(38,10)  (both engines round-to-nearest; decimal-ish
                             values land exactly on the grid)
    → round HALF_UP to 4    (now operating on identical decimals)
    → cast back to DOUBLE   (identical bit patterns, stable hash)

Verified empirically: both engines agree on the boundary case above
and on 1000 random doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def r4(col: Column | str) -> Column:
    """Spark side of the canonical rounding."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("decimal(38,10)"), 4).cast("double")


def r4sql(expr: str) -> str:
    """DuckDB side of the canonical rounding."""
    return f"CAST(ROUND(CAST(({expr}) AS DECIMAL(38,10)), 4) AS DOUBLE)"


def round_doubles(df: DataFrame, *cols: str) -> DataFrame:
    """Apply the canonical rounding to named columns, keeping order."""
    return df.select(
        *[r4(c).alias(c) if c in cols else F.col(c) for c in df.columns]
    )
