"""Product quantization (PQ) for the embedding column (EXT).

The standard compression for billion-scale ANN (Jégou et al. 2011,
"Product Quantization for Nearest Neighbor Search"; the FAISS ``PQm``
index family): split each d-dim vector into ``m`` subvectors, learn a
``ksub``-entry codebook per subspace (KMeans on a BOUNDED sample, like
the IVF coarse quantizer), and store each vector as ``m`` uint8 codes.
At 64-dim float64 that is 512 bytes → 8 bytes per vector (64×); a
100 TB embedding corpus becomes a ~1.6 TB code table that a linear
ADC scan reads instead of the raw vectors.

Split of responsibilities, mirroring ``ivf.py``:

1. **train_pq (offline)** — per-subspace KMeans on a bounded training
   collect (model state: m × ksub × d/m floats, never corpus-sized).
2. **encode_pq (one narrow pass)** — mapInPandas over the corpus:
   per-subspace nearest-centroid codes packed into a ``binary`` column
   plus the reconstruction norm (Σ per-subspace centroid norms² —
   exact for the concatenated reconstruction, so cosine needs no
   second corpus pass).
3. **adc_topk (per query batch)** — asymmetric distance computation:
   each query builds an m×ksub lookup table of subspace dot products
   (query stays EXACT, only the corpus side is quantized); scoring a
   code is m table gathers + a sum, vectorized in numpy. Per-partition
   partial top-k bounds the shuffle at partitions×k rows per query;
   one window takes the global top-k.

The query batch is collected driver-side and broadcast — bounded by
definition (it is a serving batch, not the corpus), the same posture
as the LSH hyperplane tables. Scores are approximate (quantized
corpus side) → registry entry is rows-only; recall is pinned by
tests/test_pq.py against the exact brute force.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from server_spark.similarity.ivf import (
    MAX_TRAIN_SAMPLE,
    _kmeans_fit,
    bounded_training_sample,
)

PQ_M = 8        # subspaces (64-dim → 8-dim subvectors)
PQ_KSUB = 256   # codebook entries per subspace (uint8 codes)


def train_pq(
    embeddings: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    seed: int = 7,
    vec_col: str = "embedding",
) -> np.ndarray:
    """(m, ksub', dsub) codebooks from a bounded training sample.
    ksub' = min(ksub, sample size): tiny corpora get degenerate but
    valid codebooks (every vector its own code)."""
    train = np.array(
        [
            row[0]
            for row in bounded_training_sample(
                embeddings, [vec_col], MAX_TRAIN_SAMPLE
            ).collect()
        ],
        dtype=np.float64,
    )
    if train.size == 0:  # empty corpus → empty codebooks; ADC over
        return np.zeros((m, 0, 0))  # an empty code table stays empty
    n, dim = train.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    k = min(ksub, n)
    return np.stack(
        [
            _kmeans_fit(train[:, j * dsub : (j + 1) * dsub], k, seed + j)
            for j in range(m)
        ]
    )


def encode_pq(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes binary[m], _rnrm double) — one Arrow-batched narrow
    pass; ``_rnrm`` is the exact reconstruction norm (subspaces are an
    orthogonal decomposition, so |recon|² = Σ_j |c_j[code_j]|²)."""
    m, ksub, dsub = codebooks.shape
    # flatten closure state: (m, ksub, dsub) and per-entry sq-norms
    cb = codebooks.copy()
    cb_sq = (codebooks * codebooks).sum(axis=2)  # (m, ksub)
    schema = T.StructType(
        [
            embeddings.schema[id_col],
            T.StructField("codes", T.BinaryType()),
            T.StructField("_rnrm", T.DoubleType()),
        ]
    )

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(mat) == 0:
                continue
            n = mat.shape[0]
            codes = np.empty((n, m), dtype=np.uint8)
            rsq = np.zeros(n)
            for j in range(m):
                sub = mat[:, j * dsub : (j + 1) * dsub]
                cbj = cb[j]
                d2 = (
                    (sub * sub).sum(axis=1)[:, None]
                    - 2.0 * (sub @ cbj.T)
                    + cb_sq[j][None, :]
                )
                cj = d2.argmin(axis=1)
                codes[:, j] = cj
                rsq += cb_sq[j][cj]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "codes": [c.tobytes() for c in codes],
                    "_rnrm": np.sqrt(rsq),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(encode, schema)


def adc_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """Approximate cosine top-k by ADC over the code table.

    cos ≈ (Σ_j LUT_j[code_j]) / (|q| · |recon|): the query side is
    exact, the corpus side is its reconstruction. Emits
    (query_id, vec_id, score_adc, rnk), rnk ≤ k per query."""
    m, ksub, dsub = codebooks.shape
    cb = codebooks
    qrows = queries.select(qid_col, qvec_col).collect()  # bounded batch
    if not qrows:  # no queries (e.g. empty corpus slice) → empty result
        return encoded.sparkSession.createDataFrame(
            [], f"{qid_col} long, {id_col} long, score_adc double, rnk int"
        )
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qmat, axis=1)
    # (nq, m, ksub) dot-product lookup tables, built once per batch
    luts = np.stack(
        [
            qmat[:, j * dsub : (j + 1) * dsub] @ cb[j].T
            for j in range(m)
        ],
        axis=1,
    )
    spark = encoded.sparkSession
    b = spark.sparkContext.broadcast((qids, qn, luts))
    schema = (
        f"{qid_col} long, {id_col} long, score_adc double"
    )

    def score(batches):
        import pandas as pd

        bqids, bqn, bluts = b.value
        nq = len(bqids)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            codes = np.frombuffer(
                b"".join(pdf["codes"]), dtype=np.uint8
            ).reshape(n, m)
            rnrm = pdf["_rnrm"].values
            ids = pdf[id_col].values
            out_q, out_i, out_s = [], [], []
            for qi in range(nq):
                lut = bluts[qi]  # (m, ksub)
                dots = lut[np.arange(m)[None, :], codes].sum(axis=1)
                denom = bqn[qi] * np.where(rnrm > 0, rnrm, np.inf)
                s = dots / denom
                mask = ids != bqids[qi]
                # partial top-k inside the partition bounds the shuffle.
                # The cut follows the SAME total order the global
                # window ranks by — (score desc, id asc) — so ties at
                # the k-th score are resolved by id here too, not by
                # an arbitrary argpartition pick that made results
                # depend on physical partitioning (r11 review
                # finding). Emission stays exactly k: strict winners,
                # then the smallest-id rows of the boundary tie class.
                cand = np.nonzero(mask)[0]
                if len(cand) > k:
                    sc = s[cand]
                    part = np.argpartition(-sc, k - 1)
                    kth = sc[part[k - 1]]
                    strict = cand[sc > kth]
                    tied = cand[sc == kth]
                    need = k - len(strict)
                    fill = tied[np.argsort(ids[tied])[:need]]
                    cand = np.concatenate([strict, fill])
                out_q.append(np.full(len(cand), bqids[qi], dtype=np.int64))
                out_i.append(ids[cand].astype(np.int64))
                out_s.append(s[cand])
            if out_q:
                yield pd.DataFrame(
                    {
                        qid_col: np.concatenate(out_q),
                        id_col: np.concatenate(out_i),
                        "score_adc": np.concatenate(out_s),
                    }
                )

    partial = encoded.mapInPandas(score, schema)
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("score_adc"), F.col(id_col)
    )
    return (
        partial.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(qid_col, id_col, F.round("score_adc", 6).alias("score_adc"), "rnk")
    )


_IVFPQ_CACHE: dict = {}


def _ivfpq_encoded(idx, m: int, ksub: int, seed: int, cache_key, id_col):
    """RESIDUAL codebooks + encoded inverted lists for an IVF index —
    the true IVFPQ (Jégou et al. §V): PQ quantizes x − centroid(x),
    whose spread is much tighter than the raw vectors', so the same
    code budget buys a finer grid. Per (vector, assigned list) there
    is one code row; returns (codebooks, encoded DF of
    (id, cluster, codes, _nrm)) with the TRUE vector norm carried so
    the cosine denominator stays exact."""
    # Key by the FULL index identity, not just the PQ params: the
    # residual codes are computed against THIS index's centroid array,
    # so two ivfpq calls sharing a cache_key but differing in
    # n_clusters / vec_col / n_assign must not share codes (a reload
    # would index a different centroid array — wrong scores or
    # IndexError). A digest of the centroids pins the exact quantizer;
    # n_assign additionally pins the replication factor of the encoded
    # inverted lists.
    import hashlib

    cent_digest = hashlib.sha1(
        np.ascontiguousarray(idx.centroids).tobytes()
    ).hexdigest()[:16]
    key = (
        cache_key,
        m,
        ksub,
        seed,
        id_col,
        idx.vec_col,
        idx.n_assign,
        cent_digest,
        "residual",
    )
    hit = _IVFPQ_CACHE.get(key) if cache_key else None
    if hit is not None:
        return hit
    # Disk layer, mirroring ivf.cached_index: the code table is
    # offline-built index state (at 100 TB it IS a written table —
    # ~8 bytes/vector parquet partitioned by cluster — not a RAM
    # cache), so steady-state queries and fresh processes reload
    # instead of re-encoding; bench-session cache clearing doesn't
    # force a re-encode either.
    import os

    from server_spark.similarity.ivf import _index_path

    spark = idx.assigned.sparkSession
    if cache_key:
        path = _index_path(key)
        cb_file = os.path.join(path, "codebooks.npy")
        codes_dir = os.path.join(path, "codes")
        try:
            if os.path.exists(cb_file):
                codebooks = np.load(cb_file)
                encoded = spark.read.parquet(codes_dir)
                hit = (codebooks, encoded)
                _IVFPQ_CACHE[key] = hit
                return hit
        except Exception:
            pass  # unreadable/partial → rebuild below
    cents = idx.centroids
    dim = idx.dim
    dsub = dim // m
    # bounded residual training sample from the assigned lists,
    # hash-ordered by (id, cluster) so list/ingest order doesn't bias
    # the residual codebooks
    rows = bounded_training_sample(
        idx.assigned,
        [idx.vec_col, "cluster"],
        MAX_TRAIN_SAMPLE,
        key_cols=[idx.id_col, "cluster"],
    ).collect()
    res = np.array(
        [np.asarray(r[0], dtype=np.float64) - cents[r[1]] for r in rows]
    )
    if res.size == 0:  # empty corpus → empty residual codebooks
        codebooks = np.zeros((m, 0, max(dsub, 0)))
    else:
        k_eff = min(ksub, len(res))
        codebooks = np.stack(
            [
                _kmeans_fit(
                    res[:, j * dsub : (j + 1) * dsub], k_eff, seed + j
                )
                for j in range(m)
            ]
        )
    cb = codebooks
    cb_sq = (codebooks * codebooks).sum(axis=2)
    schema = T.StructType(
        [
            idx.assigned.schema[id_col],
            T.StructField("cluster", T.IntegerType()),
            T.StructField("codes", T.BinaryType()),
            T.StructField("_nrm", T.DoubleType()),
        ]
    )
    vec_col = idx.vec_col

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            mat -= cents[pdf["cluster"].values]
            codes = np.empty((n, m), dtype=np.uint8)
            for j in range(m):
                sub = mat[:, j * dsub : (j + 1) * dsub]
                d2 = (
                    (sub * sub).sum(axis=1)[:, None]
                    - 2.0 * (sub @ cb[j].T)
                    + cb_sq[j][None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "cluster": pdf["cluster"].values,
                    "codes": [c.tobytes() for c in codes],
                    "_nrm": pdf["_nrm"].values,
                }
            )

    encoded = idx.assigned.select(
        id_col, vec_col, "cluster", "_nrm"
    ).mapInPandas(encode, schema).cache()
    if cache_key:
        try:
            tmp = f"{path}.tmp.{os.getpid()}"
            encoded.write.mode("overwrite").parquet(
                os.path.join(tmp, "codes")
            )
            np.save(os.path.join(tmp, "codebooks.npy"), codebooks)
            if not os.path.exists(cb_file):
                os.replace(tmp, path)
            else:  # another process won the race
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
        except Exception:
            pass  # persistence is an optimization; the cached DF works
    hit = (codebooks, encoded)
    if cache_key:
        _IVFPQ_CACHE[key] = hit
    return hit


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    seed: int = 7,
    cache_key: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """IVF-gated RESIDUAL ADC: the FAISS IVFPQ composition. Queries
    probe their ``n_probe`` nearest inverted lists (coarse quantizer)
    and only those lists' codes are read — per query
    ~corpus × n_probe/n_clusters candidates, each m byte gathers.
    The dot decomposes exactly: q·x ≈ q·c + q·recon(x−c), where q·c
    is one number per (query, probed list) (computed on the driver —
    n_q × n_probe values) and q·recon comes from the per-query LUT
    over the RESIDUAL codebooks. Residual quantization is why this
    beats gating the global-codebook ADC: measured recall@10 at
    sf0.01 0.44 (global codes) → 0.62 (residual), against the 0.70
    exact-rerank ceiling of the same IVF gate — the codes spend their
    bits on within-cell offsets instead of re-encoding the centroid
    the gate already knows.

    Boundary-replicated vectors (n_assign lists) score once per list;
    a groupBy(query, id) max keeps the best replica deterministically
    before the final top-k window."""
    from server_spark.similarity.ivf import (
        _query_probes,
        build_index,
        cached_index,
    )

    # cache only under an explicit corpus key — a made-up fallback key
    # would collide the on-disk index across different corpora and
    # silently serve candidates from the wrong one
    if cache_key:
        idx = cached_index(
            embeddings,
            cache_key=cache_key,
            n_clusters=n_clusters,
            seed=seed,
            id_col=id_col,
            vec_col=vec_col,
        )
    else:
        idx = build_index(
            embeddings, n_clusters, seed, id_col, vec_col
        )
    if idx.dim == 0:  # empty index → empty result, schema stable
        # (ivf.search's guard — without it the per-query cents @ qv
        # below raises a numpy shape error on the driver, r11 review)
        return queries.sparkSession.createDataFrame(
            [], f"{qid_col} long, {id_col} long, score_adc double, rnk int"
        )
    codebooks, encoded = _ivfpq_encoded(
        idx, m, ksub, seed, cache_key, id_col
    )
    probes = _query_probes(idx, queries, n_probe, qvec_col).select(
        qid_col, "_qn", "cluster"
    )
    cand = encoded.join(F.broadcast(probes), "cluster").filter(
        F.col(qid_col) != F.col(id_col)
    )
    mm, kk, dsub = codebooks.shape
    cb = codebooks
    cents = idx.centroids
    qrows = queries.select(qid_col, qvec_col).collect()  # bounded batch
    luts, qdotc = {}, {}
    for r in qrows:
        qv = np.asarray(r[1], dtype=np.float64)
        luts[int(r[0])] = np.stack(
            [qv[j * dsub : (j + 1) * dsub] @ cb[j].T for j in range(mm)]
        )
        qdotc[int(r[0])] = cents @ qv  # (n_clusters,)
    b = embeddings.sparkSession.sparkContext.broadcast((luts, qdotc))
    schema = f"{qid_col} long, {id_col} long, score_adc double"

    def score(batches):
        import pandas as pd

        bluts, bqdotc = b.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_q, out_i, out_s = [], [], []
            for qid, grp in pdf.groupby(qid_col):
                lut = bluts[int(qid)]
                qc = bqdotc[int(qid)]
                n = len(grp)
                codes = np.frombuffer(
                    b"".join(grp["codes"]), dtype=np.uint8
                ).reshape(n, mm)
                dots = (
                    lut[np.arange(mm)[None, :], codes].sum(axis=1)
                    + qc[grp["cluster"].values]
                )
                nrm = grp["_nrm"].values
                qn = grp["_qn"].values
                s = dots / (qn * np.where(nrm > 0, nrm, np.inf))
                out_q.append(np.full(n, qid, dtype=np.int64))
                out_i.append(grp[id_col].values.astype(np.int64))
                out_s.append(s)
            if out_q:
                yield pd.DataFrame(
                    {
                        qid_col: np.concatenate(out_q),
                        id_col: np.concatenate(out_i),
                        "score_adc": np.concatenate(out_s),
                    }
                )

    scored = (
        cand.mapInPandas(score, schema)
        # one row per (query, id): best replica wins, deterministically
        .groupBy(qid_col, id_col)
        .agg(F.max("score_adc").alias("score_adc"))
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("score_adc"), F.col(id_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            qid_col, id_col, F.round("score_adc", 6).alias("score_adc"), "rnk"
        )
    )


_PQ_CACHE: dict = {}


def _pq_encoded(
    embeddings: DataFrame,
    m: int,
    ksub: int,
    seed: int,
    cache_key: str | None,
    id_col: str,
    vec_col: str,
):
    """(codebooks, encoded-and-cached corpus) with per-corpus reuse —
    the offline step shared by pq_topk and ivfpq_topk."""
    key = (cache_key, m, ksub, seed, id_col, vec_col)
    hit = _PQ_CACHE.get(key) if cache_key else None
    if hit is None:
        codebooks = train_pq(embeddings, m, ksub, seed, vec_col)
        encoded = encode_pq(embeddings, codebooks, id_col, vec_col).cache()
        hit = (codebooks, encoded)
        if cache_key:
            _PQ_CACHE[key] = hit
    return hit


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    seed: int = 7,
    cache_key: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """Train + encode (cached per corpus, the offline step) + ADC."""
    codebooks, encoded = _pq_encoded(
        embeddings, m, ksub, seed, cache_key, id_col, vec_col
    )
    return adc_topk(
        encoded, queries, codebooks, k, id_col, qid_col, qvec_col
    )


def ivfpq_refine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    refine: int = 4,
    n_clusters: int = 16,
    n_probe: int = 4,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    seed: int = 7,
    cache_key: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """IVFPQ + exact re-rank (the FAISS ``IVFx,PQm + RFlat`` refine
    stage): the quantized ADC pass returns a ``k×refine`` shortlist,
    then ONLY those ids are re-scored against their raw vectors.
    Recall recovers to the IVF gate's exact-rerank ceiling — the PQ
    approximation error now only has to keep true neighbors inside
    the shortlist, not rank them — while the corpus-sized work stays
    in the 8-byte code domain.

    100 TB shape: the shortlist is n_q × k×refine rows (thousands) —
    broadcast it against the raw-vector table, so the refine pass is
    ONE gated scan of the corpus with zero corpus-side shuffle; the
    exact dot runs codegen-unrolled on shortlist-sized input.
    """
    from server_spark.parity import r4
    from server_spark.similarity.cosine import dot_fixed, norm

    shortlist = ivfpq_topk(
        embeddings,
        queries,
        k=k * refine,
        n_clusters=n_clusters,
        n_probe=n_probe,
        m=m,
        ksub=ksub,
        seed=seed,
        cache_key=cache_key,
        id_col=id_col,
        vec_col=vec_col,
        qid_col=qid_col,
        qvec_col=qvec_col,
    ).select(qid_col, id_col)

    qn = queries.select(
        qid_col, qvec_col, norm(qvec_col).alias("_qn")
    )
    q0 = queries.select(qvec_col).head()
    if q0 is None:  # no queries (e.g. empty corpus) → empty result
        return embeddings.sparkSession.createDataFrame(
            [], f"{qid_col} long, {id_col} long, score double, rnk int"
        )
    dim = len(q0[0])
    cand = (
        embeddings.select(id_col, vec_col)
        .join(F.broadcast(shortlist), id_col)
        .join(F.broadcast(qn), qid_col)
    )
    scored = cand.select(
        F.col(qid_col),
        F.col(id_col),
        r4(
            dot_fixed(vec_col, qvec_col, dim)
            / (norm(vec_col) * F.col("_qn"))
        ).alias("score"),
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("score"), F.col(id_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(qid_col, id_col, "score", "rnk")
    )
