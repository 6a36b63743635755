"""Fuzzy-match ranking (D2 — SURVEY.md §2.10).

The reference ranks search matches with `renstrom/fuzzysearch`'s
`RankMatchFold` [H]: case-folded subsequence match, ranked by a
Levenshtein-style distance; non-matches rank -1. The oracle-checked
search query uses plain `levenshtein` (f3_levenshtein_rank); this
module provides the exact-semantics variant as an Arrow-batched
pandas_udf (rows-only check) for users who need reference parity.

Public-knowledge semantics implemented here (fuzzysearch is MIT, the
algorithm is textbook): rank = Levenshtein distance between the
needle and the matched source, computed only when the needle is a
(case-folded) subsequence of the source; else -1.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def rank_match_fold(needle: str) -> Column:
    """Column factory: pandas_udf ranking a string column against a
    fixed needle with RankMatchFold semantics.

    All helpers live INSIDE the udf so cloudpickle ships them by value
    (Spark Python workers may not have ``server_spark`` importable —
    the driver contract allows arbitrary launch cwd).
    """
    n = needle.lower()

    @pandas_udf("long")
    def _rank(source: pd.Series) -> pd.Series:
        def is_subsequence(needle_s: str, hay: str) -> bool:
            it = iter(hay)
            return all(c in it for c in needle_s)

        def levenshtein(a: str, b: str) -> int:
            if len(a) < len(b):
                a, b = b, a
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(
                        min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                    )
                prev = cur
            return prev[-1]

        def one(s: str) -> int:
            if s is None:
                return -1
            low = s.lower()
            if not is_subsequence(n, low):
                return -1
            return levenshtein(n, low)

        return source.map(one).astype("int64")

    return _rank


def subsequence_like_pattern(needle: str) -> str:
    """The case-folded subsequence test as a SQL LIKE pattern:
    ``widget`` → ``%w%i%d%g%e%t%``. LIKE wildcards in the needle are
    escaped (default ``\\`` escape char)."""
    chars = [
        c.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")
        for c in needle.lower()
    ]
    return "%" + "%".join(chars) + "%"


def _orderable_type(dt) -> bool:
    """Whether Spark can use a column of this type in ORDER BY:
    MapType never, containers only when their element/field types
    are themselves orderable (mirrors Catalyst's
    ``RowOrdering.isOrderable``)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable_type(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable_type(f.dataType) for f in dt.fields)
    return True


def fuzzy_search(df, col: str, needle: str, k: int = 10):
    """Reference search path with exact fuzzy semantics: rank
    candidates, keep matches, top-k by (rank, value).

    The Python rank only ever runs on rows that already pass a pure
    JVM candidate gate — the subsequence condition expressed as a
    LIKE pattern plus a length bound — which is exactly the udf's own
    match predicate (for ASCII needles), so results are identical
    while the Arrow batches carry orders of magnitude fewer rows at
    catalog scale. The udf's subsequence check stays as the authority:
    a gate false-positive still ranks -1 and is filtered.
    """
    gate = F.lower(F.col(col)).like(subsequence_like_pattern(needle)) & (
        F.length(col) >= F.lit(len(needle))
    )
    ranked = df.filter(gate).withColumn(
        "rank", rank_match_fold(needle)(F.col(col))
    )
    # total order with a unique tiebreak (r12): (rank, value) alone
    # leaves the LIMIT boundary ambiguous when two rows share both —
    # remaining ORDERABLE columns join the sort so the page is the
    # same on every engine/run (the repo's standing pagination rule).
    # Map-typed columns are excluded (r12 advisor finding): Spark
    # cannot sort on MapType and a caller carrying one would get an
    # AnalysisException from the tiebreak itself.
    others = [
        f.name
        for f in df.schema.fields
        if f.name != col and _orderable_type(f.dataType)
    ]
    return (
        ranked.filter(F.col("rank") >= 0)
        .orderBy(F.col("rank").asc(), F.col(col).asc(), *others)
        .limit(k)
    )
