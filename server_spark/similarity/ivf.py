"""IVF (inverted-file) approximate nearest-neighbor search (EXT).

The classic two-level ANN index re-expressed in Spark:

1. **Train** a coarse quantizer (KMeans over the corpus — Spark ML,
   distributed) → ``n_clusters`` centroids.
2. **Assign** every corpus vector to its nearest centroid (narrow map;
   the "inverted lists" are just a cluster-id column, so the corpus
   stays partitionable by cluster).
3. **Search**: each query probes its ``n_probe`` nearest centroids and
   exact-reranks only those clusters' vectors — an equi-join on
   cluster id instead of a full scan.

Recall/cost dial: n_probe/n_clusters (like nprobe/nlist in FAISS).
Centroids are model parameters (n_clusters × dim floats) — broadcast,
never corpus data. At 1B vectors: train on a sample, assignment is a
scan, and each query touches corpus/n_clusters × n_probe vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from server_spark.parity import r4
from server_spark.similarity.cosine import cosine


def train_assign(
    embeddings: DataFrame,
    n_clusters: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Fit the coarse quantizer and assign every vector to a cluster.

    Returns (assigned DataFrame with ``cluster`` column, centroids as
    a list of lists — model parameters).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.withColumn("_features", array_to_vector(F.col(vec_col)))
    # a handful of Lloyd iterations is plenty for a coarse quantizer —
    # cluster QUALITY only moves the recall/cost dial, not correctness
    model = KMeans(
        k=n_clusters, seed=seed, maxIter=8,
        featuresCol="_features", predictionCol="cluster",
    ).fit(vecs)
    assigned = model.transform(vecs).drop("_features")
    centroids = [c.tolist() for c in model.clusterCenters()]
    return assigned, centroids


def _query_probes(
    queries: DataFrame,
    centroids: list[list[float]],
    n_probe: int,
    qvec_col: str,
) -> DataFrame:
    """(query, cluster) pairs for the n_probe nearest centroids —
    computed as a JVM expression over the broadcast centroid literals
    (Euclidean, matching KMeans assignment)."""
    dists = F.array(
        *[
            F.struct(
                F.lit(ci).alias("cluster"),
                F.aggregate(
                    F.zip_with(
                        F.col(qvec_col),
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d2"),
            )
            for ci, c in enumerate(centroids)
        ]
    )
    probes = F.slice(
        F.array_sort(
            dists, lambda l, r: F.when(l["d2"] < r["d2"], -1).when(l["d2"] > r["d2"], 1).otherwise(0)
        ),
        1,
        n_probe,
    )
    return queries.withColumn("_probe", F.explode(probes)).withColumn(
        "cluster", F.col("_probe.cluster")
    ).drop("_probe")


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: exact cosine rerank within the probed
    clusters only (equi-join on cluster id; no full corpus scan per
    query)."""
    assigned, centroids = train_assign(
        embeddings, n_clusters=n_clusters, seed=seed, id_col=id_col, vec_col=vec_col
    )
    probes = _query_probes(queries, centroids, n_probe, qvec_col)
    cand = assigned.join(F.broadcast(probes), "cluster").filter(
        F.col(qid_col) != F.col(id_col)
    )
    scored = cand.select(
        F.col(qid_col),
        F.col(id_col),
        r4(cosine(vec_col, qvec_col)).alias("score"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(qid_col, id_col, "score", "rnk")
    )
