"""Product-quantization (x47) correctness: codes, reconstruction,
and recall vs the exact brute force. The ADC scores are approximate
by construction (quantized corpus side), so there is no DuckDB twin —
these tests ARE the correctness gate (same posture as IVF/LSH)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from server_spark.queries.ext_common import N_QUERY_VECS, TOPK, _emb
from server_spark.similarity import cosine as cos
from server_spark.similarity.pq import (
    PQ_M,
    adc_topk,
    encode_pq,
    pq_topk,
    train_pq,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return _emb(spark, SF_SMOKE).cache()


@pytest.fixture(scope="module")
def codebooks(emb):
    return train_pq(emb)


def test_codebook_shape_and_determinism(emb, codebooks):
    m, ksub, dsub = codebooks.shape
    assert m == PQ_M and dsub == 64 // PQ_M
    assert ksub <= 256
    again = train_pq(emb)
    assert np.array_equal(codebooks, again), "training must be seeded"


def test_codes_are_m_bytes_and_norm_exact(emb, codebooks):
    enc = encode_pq(emb, codebooks)
    rows = enc.limit(50).collect()
    assert rows and all(len(r["codes"]) == PQ_M for r in rows)
    # _rnrm must equal the reconstruction's true norm
    m, ksub, dsub = codebooks.shape
    for r in rows[:10]:
        code = np.frombuffer(r["codes"], dtype=np.uint8)
        recon = np.concatenate([codebooks[j][code[j]] for j in range(m)])
        assert abs(np.linalg.norm(recon) - r["_rnrm"]) < 1e-9


def test_reconstruction_preserves_direction(emb, codebooks):
    """Mean cosine between vector and its reconstruction stays high —
    the quantizer is lossy but direction-preserving (what cosine ANN
    needs)."""
    m, ksub, dsub = codebooks.shape
    enc = {r["vec_id"]: r for r in encode_pq(emb, codebooks).collect()}
    cosines = []
    for r in emb.select("vec_id", "embedding").limit(200).collect():
        v = np.array(r["embedding"], dtype=np.float64)
        code = np.frombuffer(enc[r["vec_id"]]["codes"], dtype=np.uint8)
        recon = np.concatenate([codebooks[j][code[j]] for j in range(m)])
        denom = np.linalg.norm(v) * np.linalg.norm(recon)
        if denom > 0:
            cosines.append(float(v @ recon) / denom)
    assert np.mean(cosines) >= 0.95, f"mean recon cosine {np.mean(cosines):.3f}"


def test_adc_recall_vs_bruteforce(spark, emb, codebooks):
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cos.brute_force_topk(emb, queries, k=TOPK).collect()
    }
    got_rows = pq_topk(emb, queries, k=TOPK, cache_key=None).collect()
    got = {(r["query_id"], r["vec_id"]) for r in got_rows}
    # schema sanity: k rows per query, rnk dense from 1
    per_q = {}
    for r in got_rows:
        per_q.setdefault(r["query_id"], []).append(r["rnk"])
    assert all(sorted(v) == list(range(1, TOPK + 1)) for v in per_q.values())
    recall = len(got & exact) / len(exact)
    assert recall >= 0.6, f"PQ recall@{TOPK} too low: {recall:.2f}"


def test_adc_self_excluded_and_scores_bounded(spark, emb, codebooks):
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    enc = encode_pq(emb, codebooks)
    out = adc_topk(enc, queries, codebooks, k=5).collect()
    assert all(r["query_id"] != r["vec_id"] for r in out)
    assert all(-1.2 <= r["score_adc"] <= 1.2 for r in out)


def test_ivfpq_recall_vs_bruteforce(spark, emb):
    """x49: IVF gating composed with RESIDUAL ADC scoring — recall
    approaches the IVF gate's exact-rerank ceiling, and no
    out-of-corpus or self ids appear."""
    from server_spark.similarity.pq import ivfpq_topk

    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cos.brute_force_topk(emb, queries, k=TOPK).collect()
    }
    got = ivfpq_topk(
        emb, queries, k=TOPK, n_clusters=16, n_probe=4, cache_key=None
    ).collect()
    got_set = {(r["query_id"], r["vec_id"]) for r in got}
    corpus = {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert all(v in corpus for _, v in got_set)
    assert all(q != v for q, v in got_set)
    recall = len(got_set & exact) / len(exact)
    # residual encoding holds ~0.56-0.62 at both test SFs (global-code
    # gating measured 0.44 at sf0.01); floor set below run wobble
    assert recall >= 0.45, f"IVFPQ recall@{TOPK} too low: {recall:.2f}"


def test_incremental_assign_optimal_and_drift(spark, emb):
    """x51: every batch vector lands in its true nearest centroid
    (numpy cross-check), the output unions into the standing
    inverted-list table, and the drift ratio is ~1 for
    same-distribution data."""
    from server_spark.similarity.ivf import assign_batch, build_index

    base = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    idx = build_index(base, n_clusters=8, cache=False, n_assign=1)
    out = assign_batch(idx, batch).collect()
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in batch.collect()
    }
    for r in out[:100]:
        v = vecs[r["vec_id"]]
        d2 = ((idx.centroids - v) ** 2).sum(axis=1)
        assert r["cluster"] == int(d2.argmin())
        assert abs(r["_d2"] - d2.min()) < 1e-9
        assert abs(r["_nrm"] - np.linalg.norm(v)) < 1e-9
    # same-distribution batch → mean distortion ratio near 1
    base_d2 = np.mean([r["_d2"] for r in assign_batch(idx, base).collect()])
    batch_d2 = np.mean([r["_d2"] for r in out])
    assert 0.5 < batch_d2 / base_d2 < 2.0
    # assignment schema unions into the standing inverted lists
    merged = idx.assigned.unionByName(
        assign_batch(idx, batch).drop("_d2")
    )
    assert merged.count() == idx.assigned.count() + len(out)


def test_ivfpq_refine_recovers_gate_ceiling(spark, emb):
    """x52: exact re-rank of the ADC shortlist must (a) beat the pure
    ADC ranking's recall, (b) match the IVF gate's exact-rerank
    recall — PQ error can only lose candidates that fall OUT of the
    k×refine shortlist, and with refine=4 none do on this corpus."""
    from server_spark.similarity.ivf import build_index, search
    from server_spark.similarity.pq import ivfpq_refine_topk, ivfpq_topk

    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cos.brute_force_topk(emb, queries, k=TOPK).collect()
    }

    def recall(df):
        got = {(r["query_id"], r["vec_id"]) for r in df.collect()}
        return len(got & exact) / len(exact)

    kw = dict(k=TOPK, n_clusters=16, n_probe=4, cache_key=None)
    r_adc = recall(ivfpq_topk(emb, queries, **kw))
    r_ref = recall(ivfpq_refine_topk(emb, queries, refine=4, **kw))
    # same gate, exact scoring of everything the gate admits
    idx = build_index(emb, n_clusters=16, cache=False)
    r_gate = recall(search(idx, queries, k=TOPK, n_probe=4))
    assert r_ref >= r_adc, (r_ref, r_adc)
    assert r_ref >= r_gate - 0.02, (r_ref, r_gate)


def test_ivfpq_cache_keyed_by_index_identity(spark, emb):
    """Regression (r5 advice): two ivfpq calls sharing a cache_key but
    differing in n_clusters must NOT share encoded codes — the codes
    index that specific quantizer's centroid array. Before the fix the
    second call could reload the first call's codes and score against
    the wrong centroids (or IndexError)."""
    from server_spark.similarity.pq import ivfpq_topk

    qs = (
        emb.limit(3)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    a = ivfpq_topk(emb, qs, k=5, n_clusters=16, cache_key="t_keyid")
    b = ivfpq_topk(emb, qs, k=5, n_clusters=4, cache_key="t_keyid")
    ra, rb = a.collect(), b.collect()
    assert len(ra) > 0 and len(rb) > 0
    # both runs must be self-consistent: rnk 1..k per query, scores in [-1, 1]
    for rows in (ra, rb):
        for r in rows:
            assert -1.000001 <= r["score_adc"] <= 1.000001
