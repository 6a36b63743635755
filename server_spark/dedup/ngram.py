"""N-gram Jaccard near-duplicate detection (EXT).

Word n-gram shingles per document, then pairwise Jaccard over the
inverted shingle index: pairs sharing a shingle are candidates;
|A∩B| falls out of a groupBy over the shingle-join; |A∪B| = |A|+|B|−|A∩B|.

Scale posture: this is the EXACT form — the shingle self-join is
O(Σ posting-list²) and only viable when no shingle is hot. At 100 TB
the scale path is MinHash banding (dedup/minhash.py) which prunes the
candidate space before any join; this module then scores only the
LSH-surviving candidate pairs (pass ``candidates``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from server_spark.barrier import barrier, lazy_barrier


def split_words(text_col: str | Column = "text") -> Column:
    """Lowercased whitespace word array of a text column."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.lower(F.trim(col)), r"\s+")


def shingle_array(
    words_col: str | Column, n: int = 3, distinct: bool = True
) -> Column:
    """Word n-gram shingles from a WORDS-ARRAY column — a pure narrow
    map (indexed n-gram assembly, → array_distinct when ``distinct``),
    no explode, no window, no shuffle. Docs shorter than n words yield
    an empty array. ``distinct=False`` keeps the full occurrence
    stream (one gram per start position), for consumers that count
    repeats (x25).

    ``words_col`` MUST be a projected column (split_words in its own
    select), not an inline split expression: the lambda below
    references it once per n-gram position, lambda bodies block
    common-subexpression elimination, and Catalyst will not collapse
    a multiply-referenced non-cheap projection — measured 20× slower
    with the split inlined."""
    words = F.col(words_col) if isinstance(words_col, str) else words_col
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(words, (i + j + 1).cast("int")) for j in range(n)],
            ),
        ),
    ).otherwise(F.slice(words, 1, 0))  # typed empty array<string>
    return F.array_distinct(grams) if distinct else grams


def word_shingles(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct word n-gram shingles per document as (id, shingle)
    rows: explode of :func:`shingle_array` — per-doc distinctness is
    free (array_distinct in the narrow map), so the relation needs no
    distinct shuffle and no window sort. The oracle twin keeps the
    dialect-portable posexplode + LEAD window form (identical set)."""
    return docs.select(
        F.col(id_col), split_words(text_col).alias("_words")
    ).select(
        F.col(id_col),
        F.explode(shingle_array("_words", n)).alias("shingle"),
    )


def jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
    text_col: str = "text",
    arrs: DataFrame | None = None,
) -> DataFrame:
    """All document pairs (a < b) with shingle-Jaccard ≥ threshold.

    Without ``candidates``: the exact inverted-index self-join (only
    viable when no shingle is hot — the join is quadratic in posting-
    list length). With ``candidates`` (doc_a, doc_b), e.g. MinHash LSH
    banding: VERIFICATION ONLY — each candidate pair's exact Jaccard
    from an array intersection of the two shingle sets; the shingle
    self-join never happens, so a hot shingle costs nothing beyond
    its docs' set sizes. That bucket-then-verify composition is the
    100 TB shape.

    ``arrs``: an ALREADY-MATERIALIZED per-doc distinct shingle-array
    relation (id_col, ``_sh``), exactly ``docs → split_words →
    shingle_array`` — callers that also feed a signature pipeline from
    the same tokenization (x106's two legs) pass it so the corpus is
    tokenized ONCE instead of once per leg (r14, guide §1.2 "don't
    compute things twice"). The caller owns the barrier.
    """
    if candidates is not None:
        # verification path references the shingle relation once — no
        # materialization needed
        return jaccard_verify(
            word_shingles(docs, n, id_col, text_col),
            candidates,
            threshold,
            id_col,
        )
    # Per-doc set sizes are computed at EXPLODE time from the shingle
    # array's length (no sizes relation, no size joins — the r9 x75
    # pattern; the array is barriered first because size()+explode()
    # double-reference a lambda-bearing projection and CSE won't save
    # it). The materialization also covers the two self-join branches
    # (Catalyst plans zero ReusedExchange across them).
    if arrs is None:
        # fan_out: the shingle+md5 narrow map below is the expensive
        # stage and sits directly on the scan (r14, tables.fan_out)
        from server_spark.tables import fan_out

        docs = fan_out(docs)
        arrs = docs.select(
            F.col(id_col), split_words(text_col).alias("_words")
        ).select(
            F.col(id_col), shingle_array("_words", n).alias("_sh")
        ).transform(lazy_barrier)
    sh = arrs.select(
        F.col(id_col),
        F.size("_sh").alias("n_sh"),
        F.explode("_sh").alias("shingle"),
    )

    a = sh.select(
        F.col(id_col).alias("doc_a"), F.col("n_sh").alias("sh_a"), "shingle"
    )
    b = sh.select(
        F.col(id_col).alias("doc_b"), F.col("n_sh").alias("sh_b"), "shingle"
    )
    # exact size-ratio bound INSIDE the join predicate: J <= min/max,
    # so pairs whose set sizes differ beyond the threshold are pruned
    # BEFORE the pair-count groupBy shuffle (semantics-preserving —
    # they could never reach the threshold)
    inter = (
        a.join(
            b,
            (a["shingle"] == b["shingle"])
            & (F.col("doc_a") < F.col("doc_b"))
            & (
                F.least("sh_a", "sh_b")
                >= threshold * F.greatest("sh_a", "sh_b")
            ),
        )
        .drop(b["shingle"])
        .groupBy("doc_a", "doc_b", "sh_a", "sh_b")
        .agg(F.count("*").alias("n_common"))
    )
    scored = inter.withColumn(
        "jaccard",
        F.col("n_common")
        / (F.col("sh_a") + F.col("sh_b") - F.col("n_common")),
    )
    return scored.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "n_common", "jaccard"
    )


def jaccard_verify_arrays(
    token_sets: DataFrame,
    candidates: DataFrame,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    arr_col: str = "vs",
) -> DataFrame:
    """Exact Jaccard for candidate pairs from per-doc TOKEN-SET ARRAYS
    (one row per doc, tokens already distinct): two equi-joins keying
    the candidate list to each side's array, then a JVM
    array_intersect per pair. No explode, no set aggregation — the
    fully array-native verify path (``token_sets`` should be
    materialized by the caller if its upstream is expensive)."""
    sets = token_sets.select(
        F.col(id_col), F.col(arr_col).alias("sh_set")
    ).withColumn("n_sh", F.size("sh_set"))
    scored = (
        candidates.select("doc_a", "doc_b")
        .join(
            sets.select(
                F.col(id_col).alias("doc_a"),
                F.col("sh_set").alias("set_a"),
                F.col("n_sh").alias("sh_a"),
            ),
            "doc_a",
        )
        .join(
            sets.select(
                F.col(id_col).alias("doc_b"),
                F.col("sh_set").alias("set_b"),
                F.col("n_sh").alias("sh_b"),
            ),
            "doc_b",
        )
        .withColumn("n_common", F.size(F.array_intersect("set_a", "set_b")))
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("sh_a") + F.col("sh_b") - F.col("n_common")),
        )
    )
    return scored.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "n_common", "jaccard"
    )


def jaccard_verify(
    shingles: DataFrame,
    candidates: DataFrame,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    token_col: str = "shingle",
) -> DataFrame:
    """Exact Jaccard for the given candidate pairs only.

    Shape: per-doc token SETS (one agg), then two equi-joins keying
    the candidate list to each side's set, then a JVM array_intersect
    per pair — two narrow shuffles, no self-join, cost linear in
    Σ |set_a| + |set_b| over candidates. Pairs sharing no token get
    jaccard 0 and fall out of any positive threshold.

    ``token_col`` may be the raw shingle string or a compact hashed
    form (dedup/minhash.md5_vals) — 8-byte longs shrink the joined
    arrays ~2.5× vs 3-gram strings, which dominates verify cost.
    Set sizes come from the collected set, so duplicate or colliding
    tokens stay consistent with the intersection semantics.
    """
    # referenced by BOTH side-joins below — materialize the
    # collect_set aggregation once
    sets = shingles.groupBy(id_col).agg(
        F.collect_set(token_col).alias("sh_set"),
    ).withColumn("n_sh", F.size("sh_set")).transform(lazy_barrier)
    scored = (
        candidates.select("doc_a", "doc_b")
        .join(
            sets.select(
                F.col(id_col).alias("doc_a"),
                F.col("sh_set").alias("set_a"),
                F.col("n_sh").alias("sh_a"),
            ),
            "doc_a",
        )
        .join(
            sets.select(
                F.col(id_col).alias("doc_b"),
                F.col("sh_set").alias("set_b"),
                F.col("n_sh").alias("sh_b"),
            ),
            "doc_b",
        )
        .withColumn("n_common", F.size(F.array_intersect("set_a", "set_b")))
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("sh_a") + F.col("sh_b") - F.col("n_common")),
        )
    )
    return scored.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "n_common", "jaccard"
    )
