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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def word_shingles(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct word n-gram shingles per document, via posexplode +
    lead windows (dialect-identical SQL exists for the oracle)."""
    words = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("pos", "word"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    parts = [F.col("word")] + [F.lead("word", i).over(w) for i in range(1, n)]
    shingled = words.select(
        F.col(id_col), F.concat_ws(" ", *parts).alias("shingle"),
        *[F.lead("word", n - 1).over(w).alias("_last")],
    ).filter(F.col("_last").isNotNull())
    return shingled.select(id_col, "shingle").distinct()


def jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
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
    """
    if candidates is not None:
        # verification path references the shingle relation once — no
        # materialization needed
        return jaccard_verify(
            word_shingles(docs, n, id_col), candidates, threshold, id_col
        )
    # The shingle relation feeds BOTH self-join branches AND the two
    # size lookups — four references, and Catalyst plans zero
    # ReusedExchange across them (verified on the executed plan), so
    # without materialization the explode+window pipeline (and its
    # whole upstream, e.g. x21's quality+dedup stages) runs 4×.
    sh = word_shingles(docs, n, id_col).localCheckpoint()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))

    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    scored = (
        inter.join(sizes.withColumnsRenamed({id_col: "doc_a", "n_sh": "sh_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({id_col: "doc_b", "n_sh": "sh_b"}), "doc_b")
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
) -> DataFrame:
    """Exact Jaccard for the given candidate pairs only.

    Shape: per-doc shingle SETS (one agg), then two equi-joins keying
    the candidate list to each side's set, then a JVM array_intersect
    per pair — two narrow shuffles, no self-join, cost linear in
    Σ |set_a| + |set_b| over candidates. Pairs sharing no shingle get
    jaccard 0 and fall out of any positive threshold.
    """
    sets = shingles.groupBy(id_col).agg(
        F.collect_set("shingle").alias("sh_set"),
        F.count("*").alias("n_sh"),
    )
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
