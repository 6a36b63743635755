"""Focused tests for the r14 optimization-round internal changes.

Each test pins an operator-internal restructure against the behavior
it must preserve bit-for-bit:

- banded_keys / _md5_minhash_pairs now PACK adjacent md5-signature
  components into longs instead of pipe-joining strings (guide §2.3,
  narrower shuffle keys) — the candidate set must be IDENTICAL to the
  string form, which these tests reconstruct inline as the reference.
- jaccard_pairs grew an ``arrs`` parameter so x106 can tokenize the
  corpus once for both of its legs — the pre-built-relation path must
  return exactly the default path's rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from server_spark.dedup import minhash as mh
from server_spark.dedup import ngram as ng


def _toy_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "a completely different document about spark shuffles"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "short doc"),  # < 3 words after split -> empty shingle set
        (6, "spark shuffles are completely different here too"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _string_banded_keys(sig, k: int, n_bands: int):
    """The pre-r14 banded_keys (pipe-joined string band keys),
    reconstructed as the reference implementation."""
    rows = k // n_bands
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "|",
                    F.transform(
                        F.slice("sig", b * rows + 1, rows),
                        lambda x: x.cast("string"),
                    ),
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return sig.select(
        F.col("doc_id"), F.explode(band_entries).alias("be")
    ).select("doc_id", "be.band_idx", "be.band_key")


def _pairs(df):
    return sorted(
        (r["doc_a"], r["doc_b"]) for r in df.select("doc_a", "doc_b").collect()
    )


def test_packed_band_keys_same_candidates_r4(spark):
    """32 hashes / 8 bands (r = 4, struct of two packed longs): the
    packed keys must bucket exactly like the string keys."""
    docs = _toy_docs(spark)
    coeffs = mh.md5_coeffs(32, seed=7)
    sig = mh.md5_signatures(ng.word_shingles(docs, n=3), coeffs)
    packed = mh.banded_keys(sig, 32, 8)
    strung = _string_banded_keys(sig, 32, 8)
    got = _pairs(mh.bucket_pairs(packed, ["band_idx", "band_key"]))
    want = _pairs(mh.bucket_pairs(strung, ["band_idx", "band_key"]))
    assert got == want and len(want) > 0


def test_packed_band_keys_same_candidates_r2(spark):
    """16 hashes / 8 bands (r = 2, single packed long)."""
    docs = _toy_docs(spark)
    coeffs = mh.md5_coeffs(16, seed=4321)
    sig = mh.md5_signatures(ng.word_shingles(docs, n=3), coeffs)
    packed = mh.banded_keys(sig, 16, 8)
    strung = _string_banded_keys(sig, 16, 8)
    assert _pairs(
        mh.bucket_pairs(packed, ["band_idx", "band_key"])
    ) == _pairs(mh.bucket_pairs(strung, ["band_idx", "band_key"]))


def test_packed_band_key_injective_on_empty_sets(spark):
    """Docs with empty token sets carry all-null signature components
    through the array-native path; packed-null keys must keep
    grouping them together (matching the string form, where
    concat_ws over nulls gave every empty doc the '' key)."""
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "a b"), (3, "one two three four")],
        ["doc_id", "text"],
    )
    coeffs = mh.md5_coeffs(32, seed=7)
    vsets = mh.md5_val_arrays(docs, n=3)
    sig = vsets.select(
        "doc_id", mh.md5_sig_array("vs", coeffs).alias("sig")
    )
    kv = mh.banded_keys(sig, 32, 8)
    got = _pairs(mh.bucket_pairs(kv, ["band_idx", "band_key"]))
    # docs 1 and 2 both have empty 3-gram sets -> identical (all-null)
    # packed keys -> they must still surface as a candidate pair
    assert (1, 2) in got


def test_jaccard_pairs_prebuilt_arrs_identical(spark):
    docs = _toy_docs(spark)
    default = ng.jaccard_pairs(docs, n=3, threshold=0.2)
    arrs = docs.select(
        "doc_id", ng.split_words("text").alias("_w")
    ).select("doc_id", ng.shingle_array("_w", 3).alias("_sh"))
    via_arrs = ng.jaccard_pairs(docs, n=3, threshold=0.2, arrs=arrs)
    assert sorted(map(tuple, default.collect())) == sorted(
        map(tuple, via_arrs.collect())
    )


# ---------------------------------------------------------------------------
# tables.fan_out — scale-adaptive scan fan-out (guide §2.2/§6)
# ---------------------------------------------------------------------------


def test_fan_out_fires_on_underpartitioned_input(spark):
    from server_spark.tables import fan_out

    docs = _toy_docs(spark).coalesce(1)
    target = spark.sparkContext.defaultParallelism
    fanned = fan_out(docs)
    assert fanned.rdd.getNumPartitions() == target
    # row set is untouched (repartition only moves rows)
    assert sorted(map(tuple, fanned.collect())) == sorted(
        map(tuple, docs.collect())
    )


def test_fan_out_noop_when_already_parallel(spark):
    from server_spark.tables import fan_out

    target = spark.sparkContext.defaultParallelism
    docs = _toy_docs(spark).repartition(target + 1)
    # already >= default parallelism -> IDENTITY, no exchange added
    assert fan_out(docs) is docs


def test_fan_out_key_columns_preserve_rows(spark):
    from server_spark.tables import fan_out

    docs = _toy_docs(spark).coalesce(1)
    fanned = fan_out(docs, "doc_id")
    assert fanned.rdd.getNumPartitions() == (
        spark.sparkContext.defaultParallelism
    )
    assert sorted(map(tuple, fanned.collect())) == sorted(
        map(tuple, docs.collect())
    )


# ---------------------------------------------------------------------------
# x38 — single-shuffle exact-match group + max(struct) argmax pick
# ---------------------------------------------------------------------------


def test_x38_argmax_struct_matches_joinback_reference(spark):
    # scored-like relation with ties on the max jaccard: the struct
    # form must pick max jaccard then MIN doc_b, exactly like the old
    # groupBy(max) + join-back + min re-group
    rows = [
        (10, 3, 0.9), (10, 1, 0.9), (10, 2, 0.4),
        (20, 7, 0.8),
        (30, 5, 0.7), (30, 4, 0.7), (30, 9, 0.7),
    ]
    scored = spark.createDataFrame(rows, ["doc_a", "doc_b", "jaccard"])
    got = (
        scored.groupBy("doc_a")
        .agg(
            F.max(
                F.struct("jaccard", (-F.col("doc_b")).alias("_nb"))
            ).alias("_m")
        )
        .select(
            "doc_a",
            F.col("_m.jaccard").alias("bj"),
            (-F.col("_m._nb")).alias("near_base"),
        )
    )
    best = scored.groupBy("doc_a").agg(F.max("jaccard").alias("bj"))
    ref = (
        scored.join(best, "doc_a")
        .filter(F.col("jaccard") == F.col("bj"))
        .groupBy("doc_a", "bj")
        .agg(F.min("doc_b").alias("near_base"))
        .select("doc_a", "bj", "near_base")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect())
    )


def test_x38_exact_group_matches_join_reference(spark):
    # one-groupBy exact-dup pick == the old batch x base hash join +
    # per-batch-doc min re-group, on a corpus with dup hashes across
    # and within the batch/base split
    rows = [
        (10, "aa"), (11, "aa"), (20, "aa"),   # 10,20 batch; 11 base
        (30, "bb"), (12, "bb"),
        (40, "cc"),                            # batch-only hash
        (13, "dd"),                            # base-only hash
    ]
    hx = spark.createDataFrame(rows, ["doc_id", "h"])
    is_batch = F.col("doc_id") % 10 == 0
    got = (
        hx.groupBy("h")
        .agg(
            F.min(F.when(~is_batch, F.col("doc_id"))).alias("exact_base"),
            F.collect_list(F.when(is_batch, F.col("doc_id"))).alias("_bm"),
        )
        .filter(F.col("exact_base").isNotNull())
        .select(F.explode("_bm").alias("doc_id"), "exact_base")
    )
    ref = (
        hx.filter(is_batch)
        .join(
            hx.filter(~is_batch).select(
                F.col("doc_id").alias("base_id"), "h"
            ),
            "h",
        )
        .groupBy("doc_id")
        .agg(F.min("base_id").alias("exact_base"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect())
    )
