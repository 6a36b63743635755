"""PII detection / redaction for training-data pipelines (EXT).

Emails, North-American phone numbers, and IPv4 addresses are matched
with patterns valid in BOTH regex engines the repo targets (Java
`java.util.regex` on the Spark side, RE2 in the DuckDB oracle): no
backreferences, no lookaround, `\\b` / `\\d` / character classes only.

Everything is `regexp_extract_all` / `regexp_replace` built-ins —
whole-stage codegen, zero shuffle — so at 100 TB scrubbing runs at
scan speed as a narrow map, exactly like textstats.analysis.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# Redaction order matters (an email's domain must be consumed before
# the IPv4 pass sees its dots): email → ip → phone, same order both
# engines.
PATTERNS: tuple[tuple[str, str], ...] = (
    ("EMAIL", EMAIL_RE),
    ("IP", IPV4_RE),
    ("PHONE", PHONE_RE),
)


def match_count(col: Column | str, pattern: str) -> Column:
    """Number of non-overlapping matches of ``pattern`` in ``col``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def scrub(col: Column | str) -> Column:
    """Redact every PII match with a ``<TYPE>`` placeholder token."""
    c = F.col(col) if isinstance(col, str) else col
    for name, pat in PATTERNS:
        c = F.regexp_replace(c, pat, f"<{name}>")
    return c
