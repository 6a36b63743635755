"""Cross-engine float canonicalization for oracle comparison.

Spark's ``round()`` rounds the exact binary double (Java BigDecimal
HALF_UP on the binary value) while DuckDB's ``ROUND`` behaves like
rounding the shortest decimal representation — e.g. the double
1730.9467499999998 rounds to 1730.9467 in Spark but 1730.9468 in
DuckDB. Since order-dependent float aggregation also wobbles in the
last ulps, every double-typed aggregate that crosses the oracle
boundary is canonicalized the same way on BOTH sides — and every
conversion step is routed through the SHORTEST-REPR STRING, because
that is the one representation both engines compute identically:

    double → string        (shortest round-trip repr: the digit
                            sequence is unique, so Java's
                            Double.toString and DuckDB's Ryu emit the
                            same digits — only the E-notation dress
                            differs, which decimal parsing ignores)
    → DECIMAL(38,10)       (exact from digits — NO scaled double
                            multiply, see below)
    → round HALF_UP to 4   (now operating on identical decimals)
    → string → DOUBLE      (correctly-rounded parse on both engines)

Why the string detours (measured, pinned by
tests/test_fuzz_parity.py::test_fuzz_r4_canonicalization_agrees):
the earlier direct form ``CAST(v AS DECIMAL(38,10))`` diverged for
|v| ≳ 3e10 because DuckDB performs the conversion as a scaled double
multiply (v·10¹⁰ overflows double ulp resolution ≈ the 4th decimal at
that magnitude), and its DECIMAL→DOUBLE division loses further ulps
above ~1e12. The string route is exact at every step until the final
correctly-rounded parse, so agreement holds across the full tested
range 1e-8..1e14 (6000-value fuzz, zero divergences) and outputs are
bit-identical to the old form for |v| ≤ 1e9 — existing oracle hashes
below that magnitude are unchanged. Contract bound: |v| < 1e28
(DECIMAL(38,10) overflow).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def r4(col: Column | str) -> Column:
    """Spark side of the canonical rounding."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("string").cast("decimal(38,10)"), 4).cast("double")


def r4sql(expr: str) -> str:
    """DuckDB side of the canonical rounding. Spelled with ``STRING``
    (not VARCHAR): DuckDB accepts it as a VARCHAR alias and Spark
    parses it natively, so the s10 SQL-front-door query and the fuzz
    harness can run the exact same string on both engines."""
    return (
        "CAST(CAST(ROUND(CAST(CAST(("
        + expr
        + ") AS STRING) AS DECIMAL(38,10)), 4) AS STRING) AS DOUBLE)"
    )


def round_doubles(df: DataFrame, *cols: str) -> DataFrame:
    """Apply the canonical rounding to named columns, keeping order."""
    return df.select(
        *[r4(c).alias(c) if c in cols else F.col(c) for c in df.columns]
    )
