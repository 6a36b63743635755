"""SimHash near-duplicate fingerprinting (EXT).

64-bit SimHash: hash each token to 64 bits, sum signed bit
contributions across tokens, take the sign per bit. Near-dups have
small Hamming distance between fingerprints. Everything stays in
JVM built-ins: xxhash64 for token hashes, bit arithmetic via shifts —
no Python UDF, so at 100 TB this is a pure narrow map over documents
followed by (optionally) a banded self-join on fingerprint prefixes.

Engine-specific hash (Spark xxhash64) → rows-only for the oracle;
semantics asserted in unit tests (identical docs → identical
fingerprint; near-identical docs → small Hamming distance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simhash64(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One (id, simhash) row per document."""
    tokens = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    # per (doc, bit): contribution ±1 depending on the token-hash bit.
    # All three 64-wide expression blocks are assembled as SQL strings
    # (one F.expr parse each), not nested Column operators — the
    # operator form costs ~5 py4j round trips per node and these loops
    # alone were ~2 s of DRIVER time per x9 build (r15; see
    # cosine.dot_fixed). Parsed trees are identical (CASE WHEN ⇔
    # when/otherwise, & ⇔ bitwiseAND, left-assoc |).
    contribs = tokens.select(
        id_col,
        *[
            F.expr(
                f"CASE WHEN (shiftright(h, {i}) & 1) = 1 "
                f"THEN 1 ELSE -1 END AS b{i}"
            )
            for i in range(64)
        ],
    )
    sums = contribs.groupBy(id_col).agg(
        *[F.expr(f"sum(b{i}) AS b{i}") for i in range(64)]
    )
    bit_terms = [
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        if i < 63
        # bit 63 would overflow a signed long via (1<<63); use shiftleft
        else "(CASE WHEN b63 > 0 THEN shiftleft(CAST(1 AS BIGINT), 63) ELSE 0 END)"
        for i in range(64)
    ]
    fingerprint = F.expr(
        "CAST(0 AS BIGINT) | " + " | ".join(bit_terms)
    )
    return sums.select(F.col(id_col), fingerprint.alias("simhash"))


def hamming_pairs(
    fingerprints: DataFrame, max_distance: int, id_col: str = "doc_id"
) -> DataFrame:
    """Pairs within Hamming distance. Exact form is a self cross-join —
    fine at test scale; the scale path bands the 64 bits into k chunks
    (near-dups within d bits must share ≥1 of d+1 chunks exactly) and
    equi-joins per chunk."""
    a = fingerprints.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("ha"))
    b = fingerprints.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("hb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_distance)
        .select("doc_a", "doc_b", "hamming")
    )


def banded_hamming_pairs(
    fingerprints: DataFrame, max_distance: int, n_bands: int = 4,
    id_col: str = "doc_id", max_bucket: int | None = None,
) -> DataFrame:
    """Scale path: band the 64-bit fingerprint into ``n_bands`` chunks;
    any pair within ``max_distance < n_bands`` Hamming bits must agree
    exactly on at least one chunk (pigeonhole). Candidates come from
    the shared :func:`server_spark.dedup.minhash.bucket_pairs` kernel
    — ONE shuffle (bucket per (band, chunk) + narrow pair expansion),
    not the kv self-join this used before r11, which shuffled the
    banded relation twice and had no hot-bucket guard (one degenerate
    chunk value, e.g. the all-zero band of short docs, exploded into
    m²/2 join rows). The fingerprint rides the expansion as payload,
    so the exact bit_count verify needs no re-join."""
    from server_spark.dedup.minhash import bucket_pairs

    width = 64 // n_bands
    banded = fingerprints.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bc"),
    ).select(id_col, "simhash", "bc.band", "bc.chunk")
    pairs = bucket_pairs(
        banded,
        ["band", "chunk"],
        id_col=id_col,
        payload=("simhash",),
        max_bucket=max_bucket,
    )
    return (
        pairs.withColumn(
            "hamming",
            F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b"))),
        )
        .filter(F.col("hamming") <= max_distance)
        .select("doc_a", "doc_b", "hamming")
    )
