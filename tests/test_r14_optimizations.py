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
