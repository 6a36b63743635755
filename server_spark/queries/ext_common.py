"""Shared plumbing for the EXT query families (SURVEY.md §2 EXT rows,
§7.4): table loaders, thresholds, and the word-shingle SQL fragment
every dedup/contamination oracle reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server_spark import tables

N_QUERY_VECS = 5          # query set for top-k similarity
TOPK = 10
NEARDUP_COS = 0.35        # embedding near-dup threshold (max ≈ 0.51)
JACCARD_MIN = 0.2         # n-gram near-dup threshold


from server_spark.tables import fan_out  # noqa: F401  (re-export)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Ingest-hygiene contract: a NULL vector has no similarity
    # semantics and would poison every numpy batch downstream — drop
    # at the loader (one pushed-down IS NOT NULL), the same posture
    # as the reference's decode-or-skip intake.
    return tables.load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )


def hash_sample(
    df: DataFrame, mod: int | None, col: str = "doc_id"
) -> DataFrame:
    """Deterministic 1/mod hash-sample on an id column (md5-prefix
    arithmetic — reproducible across runs, engines and cluster sizes,
    unlike rng `.sample()`). ``mod=None``/``1`` is a no-op.

    This is the scale valve for SUPER-LINEAR *eval* queries (x106/
    x107 and any eval whose truth leg is all-pairs): the decision
    pipeline itself stays sketch-only at any size, but an exact-truth
    leg joins shingle inventories pairwise and must therefore run on
    a bounded sample at 100 TB. Estimator-quality metrics (precision/
    recall/bias curves) are corpus-size-free, so a hash-sample is
    statistically sufficient; see SCALE.md 'Sampling super-linear
    evals'."""
    if not mod or mod <= 1:
        return df
    bucket = F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    return df.filter(bucket % mod == 0)


def shingle_ctes(
    src: str = "documents", carry: str = "", distinct: bool = True
) -> str:
    """CTE chain ``w, sh0, sh`` producing word-3-gram shingles per
    doc from a relation ``src`` with (doc_id, text[, carry]) — the
    DuckDB twin of dedup/ngram.word_shingles. ``carry`` propagates
    extra columns (e.g. ``source``) through to ``sh``."""
    cols = "doc_id" + (f", {carry}" if carry else "")
    dedup = "DISTINCT " if distinct else ""
    return rf"""w AS (
        SELECT {cols},
               generate_subscripts(string_split_regex(LOWER(TRIM(text)), '\s+'), 1) AS pos,
               UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS word
        FROM {src}
    ),
    sh0 AS (
        SELECT {cols},
               word || ' ' || LEAD(word, 1) OVER win || ' ' || LEAD(word, 2) OVER win AS shingle,
               LEAD(word, 2) OVER win AS last2
        FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
    ),
    sh AS (SELECT {dedup}{cols}, shingle FROM sh0 WHERE last2 IS NOT NULL)"""


# SINGLE SOURCE for the x17 md5 train/val/test split rule, shared by
# the split producer (x17) and every split-aware audit (x133 leakage,
# x134 cluster split, ...) in BOTH dialects — the packing_ctes lesson:
# an inlined copy of a rule that two queries must agree on WILL drift.
HASH_SPLIT_SQL = (
    "CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' "
    "THEN 'train' "
    "WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' "
    "THEN 'val' ELSE 'test' END"
)


def hash_split_col() -> "F.Column":
    """Spark twin of HASH_SPLIT_SQL over a doc_id column."""
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return (
        F.when(h2 < "cd", "train").when(h2 < "e6", "val").otherwise("test")
    )


# Boolean train-membership form of the SAME rule, for queries that
# only need train vs held-out (x85 perplexity, x91 backoff). An
# inline copy in those queries drifted to 'cc' — docs in ['cc','cd')
# were train members under x17 but scored as held-out (r11 review
# finding); deriving from one constant keeps the boundary honest.
IS_TRAIN_SQL = "substr(md5(CAST(doc_id AS STRING)), 1, 2) < 'cd'"


def is_train_col() -> "F.Column":
    """Spark twin of IS_TRAIN_SQL over a doc_id column."""
    return (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "cd"
    )
