"""MinHash + LSH near-duplicate detection (EXT) — the 100 TB dedup
scale path: signature computation is one hash-agg over the shingle
relation, banding turns the quadratic candidate search into an
equi-join on (band, band_hash).

Two implementations:
- ``minhash_candidates`` (native, default): universal-hash minhash
  entirely in JVM built-ins — xxhash64 shingle hashing, k min-aggs in
  one shuffle, banded equi-join, signature-agreement Jaccard estimate.
- ``minhash_candidates_ml``: Spark ML MinHashLSH + HashingTF variant
  (kept for API parity with ML pipelines; ~10× slower on small data
  due to approxSimilarityJoin overhead).

Engine-specific hashing → no DuckDB oracle (rows-only); correctness
is asserted in tests against exact Jaccard (dedup/ngram.py).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from server_spark.dedup.ngram import word_shingles

# Universal-hash family h(u) = (a·u + b) mod P over 32-bit shingle
# hashes. a < 2^31 and u < 2^32 keep a·u+b < 2^63 (no overflow in
# LongType); P is a prime > 2^32.
_P = 4294967311


def _coeffs(k: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, (1 << 31) - 1), rng.randrange(0, (1 << 31) - 1))
        for _ in range(k)
    ]


def minhash_signatures(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """k-permutation minhash signature per document: one wide groupBy
    (k min-aggregations, map-side combined, single shuffle)."""
    sh = word_shingles(docs, n=n, id_col=id_col, text_col=text_col)
    u = F.xxhash64("shingle").bitwiseAND(F.lit((1 << 32) - 1))
    base = sh.select(F.col(id_col), u.alias("u"))
    aggs = [
        F.min((F.col("u") * F.lit(a) + F.lit(b)) % _P).alias(f"h{i}")
        for i, (a, b) in enumerate(_coeffs(num_hashes, seed))
    ]
    return base.groupBy(id_col).agg(*aggs)


def minhash_candidates(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    n_bands: int = 8,
    min_est: float = 0.0,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-dup pairs (doc_a < doc_b, jaccard_est) via banded
    minhash LSH: pairs agreeing on ANY band of signature components
    become candidates; the estimate is the fraction of agreeing
    signature components."""
    rows_per_band = num_hashes // n_bands
    # The signature relation feeds both banded join branches AND both
    # per-side signature lookups (4 references, no exchange reuse) —
    # materialize the shingle+min-agg pipeline once.
    sig = minhash_signatures(
        docs, n=n, num_hashes=num_hashes, seed=seed, id_col=id_col
    ).localCheckpoint()

    band_entries = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(
                    *[F.col(f"h{bi * rows_per_band + j}") for j in range(rows_per_band)]
                ).alias("bsig"),
            )
            for bi in range(n_bands)
        ]
    )
    banded = sig.select(F.col(id_col), F.explode(band_entries).alias("be")).select(
        id_col, "be.band", "be.bsig"
    )
    a = banded.select(F.col(id_col).alias("doc_a"), "band", "bsig")
    b = banded.select(F.col(id_col).alias("doc_b"), "band", "bsig")
    cand = (
        a.join(b, ["band", "bsig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sig.select(
        F.col(id_col).alias("doc_a"), *[F.col(f"h{i}").alias(f"a{i}") for i in range(num_hashes)]
    )
    sb = sig.select(
        F.col(id_col).alias("doc_b"), *[F.col(f"h{i}").alias(f"b{i}") for i in range(num_hashes)]
    )
    agree = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(num_hashes)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (agree / F.lit(num_hashes)).alias("jaccard_est"),
        )
        .filter(F.col("jaccard_est") >= min_est)
    )


def shingle_vectors(
    docs: DataFrame,
    n: int = 3,
    num_features: int = 1 << 18,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sparse shingle-presence vectors for MinHashLSH."""
    from pyspark.ml.feature import HashingTF

    words = docs.select(
        F.col(id_col),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("words"),
    )
    # word n-grams as array column (JVM-side transform; no Python UDF)
    shingles = words.select(
        id_col,
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size("words") - n, F.lit(0))),
            lambda i: F.concat_ws(
                " ", *[F.element_at("words", (i + j + 1).cast("int")) for j in range(n)]
            ),
        ).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=num_features,
        binary=True,
    )
    return tf.transform(shingles)


def minhash_candidates_ml(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    max_distance: float = 0.8,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """ML-pipeline variant: candidate pairs via Spark ML MinHashLSH
    approxSimilarityJoin (jaccard_est = 1 - lsh distance)."""
    from pyspark.ml.feature import MinHashLSH

    vecs = shingle_vectors(docs, n=n, id_col=id_col)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hashes,
        seed=seed,
    )
    model = mh.fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, max_distance, distCol="jaccard_dist")
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("doc_a"),
            F.col(f"datasetB.{id_col}").alias("doc_b"),
            (1 - F.col("jaccard_dist")).alias("jaccard_est"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )
