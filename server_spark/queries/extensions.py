"""EXT queries: dedup, similarity search, text analysis, multimodal
(SURVEY.md §2 EXT rows, §7.4) — the training-data-pipeline surface
over ``documents`` and ``embeddings``.

Engine-specific hashing (MinHash, SimHash, LSH planes) and pandas_udf
paths are rows-only; everything else carries a DuckDB oracle twin.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from server_spark import tables
from server_spark.dedup import exact as ex
from server_spark.dedup import minhash as mh
from server_spark.dedup import ngram as ng
from server_spark.dedup import simhash as sh
from server_spark.parity import r4, r4sql
from server_spark.registry import register
from server_spark.similarity import cosine as cos
from server_spark.textstats import analysis as tx
from server_spark.textstats import pii

N_QUERY_VECS = 5          # query set for top-k similarity
TOPK = 10
NEARDUP_COS = 0.35        # embedding near-dup threshold (max ≈ 0.51)
JACCARD_MIN = 0.2         # n-gram near-dup threshold


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load(spark, sf_dir, "embeddings")


# ---------------------------------------------------------------------------
# x1 — exact dedup (hash groupBy)
# ---------------------------------------------------------------------------


@register(
    "x1_exact_dedup",
    r"""
    SELECT sha256(regexp_replace(LOWER(TRIM(text)), '\s+', ' ', 'g'))
               AS content_hash,
           MIN(doc_id) AS canonical_doc_id,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY 1
    """,
    doc="EXT x1 — exact dedup: sha256 of normalized text, one group "
    "per distinct content, deterministic canonical survivor (min id).",
    tags=("ext", "dedup"),
)
def x1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ex.exact_dedup_groups(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# x2 — n-gram Jaccard near-dup (exact inverted-index form)
# ---------------------------------------------------------------------------

_X2_SQL = rf"""
    WITH w AS (
        SELECT doc_id,
               generate_subscripts(string_split_regex(LOWER(TRIM(text)), '\s+'), 1) AS pos,
               UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS word
        FROM documents
    ),
    sh0 AS (
        SELECT doc_id,
               word || ' ' || LEAD(word, 1) OVER win || ' ' || LEAD(word, 2) OVER win AS shingle,
               LEAD(word, 2) OVER win AS last2
        FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
    ),
    sh AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE last2 IS NOT NULL),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= {JACCARD_MIN}
"""


@register(
    "x2_ngram_jaccard",
    _X2_SQL,
    doc="EXT x2 — word-3-gram Jaccard near-dup pairs via the inverted "
    "shingle index (exact form; MinHash banding is the scale path).",
    tags=("ext", "dedup"),
)
def x2_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ng.jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=JACCARD_MIN)


# ---------------------------------------------------------------------------
# x3 — brute-force cosine top-k (similarity search baseline)
# ---------------------------------------------------------------------------

_EE_SQL = """
    ee AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(UNNEST(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    norms AS (SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM ee GROUP BY vec_id)
"""

_X3_SQL = f"""
    WITH {_EE_SQL},
    q AS (SELECT vec_id, i, v FROM ee WHERE vec_id < {N_QUERY_VECS}),
    dots AS (
        SELECT q.vec_id AS qid, e.vec_id AS vid, SUM(q.v * e.v) AS dot
        FROM q JOIN ee e USING (i)
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT qid AS query_id, vid AS vec_id,
               {r4sql("dot / (nq.nrm * ne.nrm)")} AS score
        FROM dots
        JOIN norms nq ON qid = nq.vec_id
        JOIN norms ne ON vid = ne.vec_id
        WHERE qid <> vid
    )
    SELECT query_id, vec_id, score, rnk FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY score DESC, vec_id
        ) AS rnk
        FROM scored
    ) WHERE rnk <= {TOPK}
"""


@register(
    "x3_cosine_topk",
    _X3_SQL,
    doc="EXT x3 — brute-force cosine top-k per query vector: zip_with/"
    "aggregate dot products (JVM, no UDF), per-query window ranking on "
    "canonically-rounded scores with vec_id tiebreak.",
    tags=("ext", "similarity"),
)
def x3_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return cos.brute_force_topk(emb, queries, k=TOPK)


# ---------------------------------------------------------------------------
# x10 — embedding-cosine near-dup pairs
# ---------------------------------------------------------------------------

_X10_SQL = f"""
    WITH {_EE_SQL},
    dots AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, SUM(a.v * b.v) AS dot
        FROM ee a JOIN ee b USING (i)
        WHERE a.vec_id < b.vec_id
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT vec_a, vec_b, {r4sql("dot / (na.nrm * nb.nrm)")} AS score
        FROM dots
        JOIN norms na ON vec_a = na.vec_id
        JOIN norms nb ON vec_b = nb.vec_id
    )
    SELECT vec_a, vec_b, score FROM scored WHERE score >= {NEARDUP_COS}
"""


@register(
    "x10_embedding_neardup",
    _X10_SQL,
    doc="EXT x10 — embedding-cosine near-duplicate pairs above "
    "threshold, computed as a block-matrix self-product (numpy matmul "
    "per block pair inside mapInPandas; no O(N²) row explosion).",
    tags=("ext", "dedup", "similarity"),
)
def x10_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cos.neardup_pairs_blocked(_emb(spark, sf_dir), threshold=NEARDUP_COS)


# ---------------------------------------------------------------------------
# x4 — text quality metrics
# ---------------------------------------------------------------------------


@register(
    "x4_text_quality",
    r"""
    SELECT doc_id,
           LENGTH(text) AS n_chars_m,
           len(string_split_regex(LOWER(TRIM(text)), '\s+')) AS n_tokens,
           CAST(LENGTH(regexp_replace(text, '[^\s]', '', 'g'))
                AS DOUBLE) / LENGTH(text) AS space_ratio,
           CAST(LENGTH(regexp_replace(LOWER(text), '[^a-z]', '', 'g'))
                AS DOUBLE) / LENGTH(text) AS alpha_ratio
    FROM documents
    """,
    doc="EXT x4 — per-document quality features (length, token count, "
    "whitespace/alpha ratios): C4/Gopher-style pre-filters as pure "
    "narrow maps.",
    tags=("ext", "textstats"),
)
def x4_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = F.col("text")
    n_chars = F.length(t)
    n_space = F.length(F.regexp_replace(t, r"[^\s]", ""))
    n_alpha = F.length(F.regexp_replace(F.lower(t), r"[^a-z]", ""))
    return _docs(spark, sf_dir).select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        tx.token_count().alias("n_tokens"),
        (n_space.cast("double") / n_chars).alias("space_ratio"),
        (n_alpha.cast("double") / n_chars).alias("alpha_ratio"),
    )


# ---------------------------------------------------------------------------
# x5 — language-ID heuristic
# ---------------------------------------------------------------------------

_MARKER_SQL = {
    lang: ", ".join(f"'{m}'" for m in markers)
    for lang, markers in tx.LANG_MARKERS.items()
}

_X5_SQL = rf"""
    WITH c AS (
        SELECT doc_id, lang,
               len(list_filter(string_split_regex(LOWER(TRIM(text)), '\s+'),
                   x -> x IN ({_MARKER_SQL['de']}))) AS c_de,
               len(list_filter(string_split_regex(LOWER(TRIM(text)), '\s+'),
                   x -> x IN ({_MARKER_SQL['en']}))) AS c_en,
               len(list_filter(string_split_regex(LOWER(TRIM(text)), '\s+'),
                   x -> x IN ({_MARKER_SQL['es']}))) AS c_es,
               len(list_filter(string_split_regex(LOWER(TRIM(text)), '\s+'),
                   x -> x IN ({_MARKER_SQL['fr']}))) AS c_fr
        FROM documents
    )
    SELECT doc_id, lang AS tagged_lang,
           CASE WHEN GREATEST(c_de, c_en, c_es, c_fr) <= 0 THEN 'und'
                WHEN c_de = GREATEST(c_de, c_en, c_es, c_fr) THEN 'de'
                WHEN c_en = GREATEST(c_de, c_en, c_es, c_fr) THEN 'en'
                WHEN c_es = GREATEST(c_de, c_en, c_es, c_fr) THEN 'es'
                ELSE 'fr' END AS guessed_lang
    FROM c
"""


@register(
    "x5_langid_heuristic",
    _X5_SQL,
    doc="EXT x5 — stopword-vote language ID (n-gram-heuristic class); "
    "deterministic alphabetical tie-break, 'und' when no markers hit.",
    tags=("ext", "textstats"),
)
def x5_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.col("lang").alias("tagged_lang"),
        tx.langid_heuristic().alias("guessed_lang"),
    )


# ---------------------------------------------------------------------------
# x6 — document fingerprint; x7 — token counting
# ---------------------------------------------------------------------------


@register(
    "x6_doc_fingerprint",
    r"""
    SELECT doc_id,
           md5(regexp_replace(LOWER(TRIM(text)), '\s+', ' ', 'g'))
               AS fingerprint
    FROM documents
    """,
    doc="EXT x6 — content fingerprint (md5 of normalized text); the "
    "SimHash variant is x9 (rows-only).",
    tags=("ext", "textstats"),
)
def x6_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select("doc_id", tx.fingerprint().alias("fingerprint"))


@register(
    "x7_token_counts",
    rf"""
    SELECT doc_id,
           len(string_split_regex(LOWER(TRIM(text)), '\s+')) AS n_ws_tokens,
           len(regexp_extract_all(LOWER(text), '{tx.TOKEN_REGEX}'))
               AS n_bpe_tokens
    FROM documents
    """,
    doc="EXT x7 — token counting: whitespace tokens and BPE-ish "
    "pre-tokenizer regex tokens per document.",
    tags=("ext", "textstats"),
)
def x7_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id",
        tx.token_count().alias("n_ws_tokens"),
        tx.bpe_token_count().alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# x15 — near-dup cluster resolution (connected components over pairs)
# ---------------------------------------------------------------------------

_X15_SQL = rf"""
    WITH RECURSIVE w AS (
        SELECT doc_id,
               generate_subscripts(string_split_regex(LOWER(TRIM(text)), '\s+'), 1) AS pos,
               UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS word
        FROM documents
    ),
    sh0 AS (
        SELECT doc_id,
               word || ' ' || LEAD(word, 1) OVER win || ' ' || LEAD(word, 2) OVER win AS shingle,
               LEAD(word, 2) OVER win AS last2
        FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
    ),
    sh AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE last2 IS NOT NULL),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)
              >= {JACCARD_MIN}
    ),
    sym AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM sym),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT reach.node, sym.dst FROM reach JOIN sym ON sym.src = reach.r
    ),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
    SELECT component AS canonical_doc_id,
           COUNT(*) AS n_members,
           array_to_string(list_sort(list(node)), ',') AS member_ids
    FROM comp GROUP BY component
"""


@register(
    "x15_neardup_components",
    _X15_SQL,
    doc="EXT x15 — dup-cluster RESOLUTION: connected components over "
    "the n-gram-Jaccard pair edges (A~B, B~C ⇒ one cluster {A,B,C}), "
    "via distributed min-label propagation with checkpointed rounds; "
    "oracle is the recursive-CTE transitive closure. One canonical "
    "survivor + member list per cluster.",
    tags=("ext", "dedup", "components"),
    late=True,
)
def x15_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from server_spark.dedup.components import resolve_clusters

    edges = ng.jaccard_pairs(
        _docs(spark, sf_dir), n=3, threshold=JACCARD_MIN
    ).select("doc_a", "doc_b")
    return resolve_clusters(edges).select(
        "canonical_doc_id", "n_members", "member_ids"
    )


# ---------------------------------------------------------------------------
# x17 — deterministic hash split; x18 — quality filter pipeline
# ---------------------------------------------------------------------------


@register(
    "x17_hash_split",
    """
    SELECT doc_id,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hash_bucket,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                     THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                     THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="EXT x17 — deterministic train/val/test split: md5-prefix "
    "bucketing (~80/10/10 via lexicographic hex thresholds). Pure "
    "narrow map, reproducible across engines/runs/cluster sizes — the "
    "property a training pipeline needs from a split (no sampling "
    "state, membership is a function of the id alone).",
    tags=("ext", "split"),
    late=True,
)
def x17_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return _docs(spark, sf_dir).select(
        "doc_id",
        h2.alias("hash_bucket"),
        F.when(h2 < "cd", "train")
        .when(h2 < "e6", "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "x18_quality_filter",
    r"""
    WITH m AS (
        SELECT doc_id,
               len(string_split_regex(LOWER(TRIM(text)), '\s+')) AS n_tokens,
               CAST(LENGTH(regexp_replace(LOWER(text), '[^a-z]', '', 'g'))
                    AS DOUBLE) / LENGTH(text) AS alpha_ratio
        FROM documents
    )
    SELECT doc_id, n_tokens, alpha_ratio,
           CASE WHEN n_tokens < 10 THEN 'too_short'
                WHEN n_tokens > 5000 THEN 'too_long'
                WHEN alpha_ratio < 0.55 THEN 'low_alpha'
                ELSE 'keep' END AS verdict,
           (n_tokens >= 10 AND n_tokens <= 5000 AND alpha_ratio >= 0.55)
               AS keep
    FROM m
    """,
    doc="EXT x18 — C4/Gopher-style quality FILTER pipeline: the x4 "
    "metrics composed into a keep/drop verdict with the first failed "
    "rule as the reason — the actual gate a pretraining corpus build "
    "applies, as one codegen narrow map.",
    tags=("ext", "textstats", "filter"),
    late=True,
)
def x18_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = F.col("text")
    n_tokens = tx.token_count()
    alpha_ratio = (
        F.length(F.regexp_replace(F.lower(t), r"[^a-z]", "")).cast("double")
        / F.length(t)
    )
    m = _docs(spark, sf_dir).select(
        "doc_id", n_tokens.alias("n_tokens"), alpha_ratio.alias("alpha_ratio")
    )
    return m.select(
        "doc_id",
        "n_tokens",
        "alpha_ratio",
        F.when(F.col("n_tokens") < 10, "too_short")
        .when(F.col("n_tokens") > 5000, "too_long")
        .when(F.col("alpha_ratio") < 0.55, "low_alpha")
        .otherwise("keep")
        .alias("verdict"),
        (
            (F.col("n_tokens") >= 10)
            & (F.col("n_tokens") <= 5000)
            & (F.col("alpha_ratio") >= 0.55)
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# x19 — deterministic stratified sample; x20 — sequence packing
# ---------------------------------------------------------------------------

STRATUM_N = 50        # docs kept per language stratum
PACK_BUDGET = 2048    # token budget per packed training sequence


@register(
    "x19_stratified_sample",
    f"""
    SELECT doc_id, lang, rn FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= {STRATUM_N}
    """,
    doc="EXT x19 — stratified sampling, hash-rank form: first N per "
    "language by md5 order. Unlike rng sampling this is reproducible "
    "across engines, runs and cluster sizes, composes with "
    "incremental data (a doc's rank only changes if earlier-hashed "
    "docs arrive), and is one window per stratum — no sampling state.",
    tags=("ext", "sample"),
    late=True,
)
def x19_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= STRATUM_N)
    )


@register(
    "x20_sequence_packing",
    rf"""
    WITH toks AS (
        SELECT doc_id,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
               len(string_split_regex(LOWER(TRIM(text)), '\s+')) AS n_tokens
        FROM documents
    )
    SELECT doc_id, shard, n_tokens,
           CAST((SUM(n_tokens) OVER w - n_tokens) // {PACK_BUDGET} AS BIGINT)
               AS pack_id,
           CAST((SUM(n_tokens) OVER w - n_tokens) % {PACK_BUDGET} AS BIGINT)
               AS pack_offset
    FROM toks
    WINDOW w AS (PARTITION BY shard ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING)
    """,
    doc="EXT x20 — sequence PACKING: greedy concat of documents into "
    "~token-budget training sequences via a running token count "
    "(pack id = starting offset ÷ budget). Sharded by an md5 prefix "
    "so the window never needs a global sort — each shard packs "
    "independently, which is exactly how a distributed packer runs at "
    "100 TB (pack within partitions, never across).",
    tags=("ext", "packing"),
    late=True,
)
def x20_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _docs(spark, sf_dir).select(
        "doc_id",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("shard"),
        tx.token_count().alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return toks.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(start / PACK_BUDGET).cast("long").alias("pack_id"),
        (start % PACK_BUDGET).cast("long").alias("pack_offset"),
    )


# ---------------------------------------------------------------------------
# x21 — the corpus-build pipeline END-TO-END (compose x18→x1→x15→x17)
# ---------------------------------------------------------------------------

_X21_SQL = rf"""
    WITH RECURSIVE kept AS (
        SELECT doc_id, text FROM documents
        WHERE len(string_split_regex(LOWER(TRIM(text)), '\s+')) BETWEEN 10 AND 5000
          AND CAST(LENGTH(regexp_replace(LOWER(text), '[^a-z]', '', 'g'))
                   AS DOUBLE) / LENGTH(text) >= 0.55
    ),
    exact AS (
        SELECT MIN(doc_id) AS doc_id, ANY_VALUE(text) AS text
        FROM (SELECT doc_id, text,
                     sha256(regexp_replace(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS h
              FROM kept)
        GROUP BY h
    ),
    w AS (
        SELECT doc_id,
               generate_subscripts(string_split_regex(LOWER(TRIM(text)), '\s+'), 1) AS pos,
               UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS word
        FROM exact
    ),
    sh0 AS (
        SELECT doc_id,
               word || ' ' || LEAD(word, 1) OVER win || ' ' || LEAD(word, 2) OVER win AS shingle,
               LEAD(word, 2) OVER win AS last2
        FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
    ),
    sh AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE last2 IS NOT NULL),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)
              >= {JACCARD_MIN}
    ),
    sym AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM sym),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT reach.node, sym.dst FROM reach JOIN sym ON sym.src = reach.r
    ),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
    survivors AS (
        SELECT e.doc_id FROM exact e
        LEFT JOIN comp ON e.doc_id = comp.node
        WHERE comp.node IS NULL OR comp.component = e.doc_id
    )
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                     THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                     THEN 'val'
                ELSE 'test' END AS split
    FROM survivors
"""


@register(
    "x21_corpus_build",
    _X21_SQL,
    doc="EXT x21 — the pretraining corpus build END-TO-END in one "
    "declarative plan: quality gate (x18 rules) → exact dedup "
    "survivors (x1) → near-dup CLUSTER resolution keeping one doc "
    "per cluster (x2 pairs + x15 components) → deterministic hash "
    "split (x17). Every stage reuses the already-verified operator; "
    "the oracle is the same composition in SQL (recursive CTE for "
    "the components).",
    tags=("ext", "dedup", "pipeline"),
    late=True,
)
def x21_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from server_spark.dedup.components import connected_components

    docs = _docs(spark, sf_dir)
    t = F.col("text")
    n_tokens = tx.token_count()
    alpha_ratio = (
        F.length(F.regexp_replace(F.lower(t), r"[^a-z]", "")).cast("double")
        / F.length(t)
    )
    kept = docs.filter(
        n_tokens.between(10, 5000) & (alpha_ratio >= 0.55)
    ).select("doc_id", "text")

    # exact dedup: keep the min doc per content hash (carry text
    # forward for shingling)
    # Materialized once: referenced by the shingle pipeline (via
    # jaccard_pairs) AND the survivors join — recomputing the
    # quality+dedup aggregation per branch doubles the heavy work.
    exact = (
        kept.select("doc_id", "text", ex.text_hash().alias("h"))
        .groupBy("h")
        .agg(F.min_by("doc_id", "doc_id").alias("doc_id"),
             F.min_by("text", "doc_id").alias("text"))
        .select("doc_id", "text")
        .localCheckpoint()
    )

    edges = ng.jaccard_pairs(exact, n=3, threshold=JACCARD_MIN).select(
        "doc_a", "doc_b"
    )
    comp = connected_components(edges)
    survivors = (
        exact.join(comp, exact.doc_id == comp.node, "left")
        .filter(F.col("node").isNull() | (F.col("component") == F.col("doc_id")))
        .select("doc_id")
    )
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return survivors.select(
        "doc_id",
        F.when(h2 < "cd", "train")
        .when(h2 < "e6", "val")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# x9b — SimHash with a CROSS-ENGINE hash (md5) → fully oracle-checked
# ---------------------------------------------------------------------------
# x9 keeps xxhash64 (fastest JVM path, rows-only); this variant derives
# the 64 token-hash bits from the first 16 md5 hex chars, which both
# engines compute identically — so the ENTIRE SimHash semantics
# (tokenize → hash → signed bit vote → sign) is value-verified against
# DuckDB, not just property-tested. Fingerprint emitted as a 64-char
# bitstring (no signed-long edge cases in the comparison).

_HEX = "0123456789abcdef"

_X9B_CHARS_SQL = ", ".join(
    f"strpos('{_HEX}', substr(md5(tok), {j + 1}, 1)) - 1 AS c{j}"
    for j in range(16)
)
_X9B_SUMS_SQL = ", ".join(
    f"SUM(2 * ((c{i // 4} >> {3 - i % 4}) & 1) - 1) AS s{i}" for i in range(64)
)
_X9B_BITS_SQL = ", ".join(
    f"CASE WHEN s{i} > 0 THEN '1' ELSE '0' END" for i in range(64)
)

_X9B_SQL = rf"""
    WITH toks AS (
        SELECT doc_id,
               UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS tok
        FROM documents
    ),
    chars AS (SELECT doc_id, {_X9B_CHARS_SQL} FROM toks),
    sums AS (SELECT doc_id, {_X9B_SUMS_SQL} FROM chars GROUP BY doc_id)
    SELECT doc_id, concat({_X9B_BITS_SQL}) AS fingerprint_bits FROM sums
"""


@register(
    "x9b_simhash_oracle",
    _X9B_SQL,
    doc="EXT x9b — SimHash with engine-portable md5 bit derivation: "
    "tokenize → 64 hash bits per token → signed bit vote → sign, "
    "value-checked end-to-end against the oracle (x9 is the faster "
    "xxhash64 production form of the same plan shape: one explode, "
    "one 64-way sum-agg shuffle).",
    tags=("ext", "dedup", "textstats"),
    late=True,
)
def x9b_simhash_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _docs(spark, sf_dir).select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    )
    md5 = F.md5("tok")
    chars = toks.select(
        "doc_id",
        *[
            F.conv(F.substring(md5, j + 1, 1), 16, 10)
            .cast("int")
            .alias(f"c{j}")
            for j in range(16)
        ],
    )
    sums = chars.groupBy("doc_id").agg(
        *[
            F.sum(
                2 * F.shiftright(F.col(f"c{i // 4}"), 3 - i % 4).bitwiseAND(1) - 1
            ).alias(f"s{i}")
            for i in range(64)
        ]
    )
    bits = [
        F.when(F.col(f"s{i}") > 0, "1").otherwise("0") for i in range(64)
    ]
    return sums.select("doc_id", F.concat(*bits).alias("fingerprint_bits"))


# ---------------------------------------------------------------------------
# x8b — MinHash+LSH with CROSS-ENGINE hashing → fully oracle-checked
# ---------------------------------------------------------------------------
# x8 keeps xxhash64 signatures (fast JVM path, rows-only); here the
# shingle is mapped to an integer via its md5 prefix and pushed through
# seeded universal hashes (a·v+b mod p) — pure integer arithmetic both
# engines evaluate identically, so signatures, banding, candidate
# pairs AND the jaccard estimate are all value-verified.

_MH_P = 4_000_037          # prime modulus; a·v+b stays < 2^63
_MH_NUM, _MH_BANDS = 32, 8  # 32 hashes = 8 bands × 4 rows
_MH_ROWS = _MH_NUM // _MH_BANDS
_MH_MIN_EST = 0.25

_mh_rng = random.Random(1234)
_MH_AB = [
    (_mh_rng.randrange(1, _MH_P), _mh_rng.randrange(0, _MH_P))
    for _ in range(_MH_NUM)
]

# md5-prefix → integer mod p: Σ hex_char_j · 16^(7-j), then % p.
# 8 hex chars = 32 bits — collision odds are negligible for shingle
# universes and it halves the per-shingle character arithmetic.
_X8B_V_SQL = "(" + " + ".join(
    f"(strpos('{_HEX}', substr(md5(shingle), {j + 1}, 1)) - 1) * {16 ** (7 - j)}"
    for j in range(8)
) + f") % {_MH_P}"

_X8B_SIGS_SQL = ", ".join(
    f"MIN(({a} * v + {b}) % {_MH_P}) AS sig{i}"
    for i, (a, b) in enumerate(_MH_AB)
)
_X8B_BANDS_SQL = ", ".join(
    "concat_ws('|', "
    + ", ".join(f"sig{band * _MH_ROWS + r}" for r in range(_MH_ROWS))
    + f") AS band{band}"
    for band in range(_MH_BANDS)
)
_X8B_MATCHES_SQL = " + ".join(
    f"CASE WHEN a.sig{i} = b.sig{i} THEN 1 ELSE 0 END" for i in range(_MH_NUM)
)

_X8B_SQL = rf"""
    WITH w AS (
        SELECT doc_id,
               generate_subscripts(string_split_regex(LOWER(TRIM(text)), '\s+'), 1) AS pos,
               UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS word
        FROM documents
    ),
    sh0 AS (
        SELECT doc_id,
               word || ' ' || LEAD(word, 1) OVER win || ' ' || LEAD(word, 2) OVER win AS shingle,
               LEAD(word, 2) OVER win AS last2
        FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
    ),
    sh AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE last2 IS NOT NULL),
    vals AS (SELECT doc_id, {_X8B_V_SQL} AS v FROM sh),
    sigs AS (SELECT doc_id, {_X8B_SIGS_SQL} FROM vals GROUP BY doc_id),
    bands AS (SELECT doc_id, {_X8B_BANDS_SQL} FROM sigs),
    kv AS (
        SELECT doc_id, band_idx, band_key FROM bands
        UNPIVOT (band_key FOR band_idx IN ({", ".join(f"band{b}" for b in range(_MH_BANDS))}))
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM kv x JOIN kv y
          ON x.band_idx = y.band_idx AND x.band_key = y.band_key
         AND x.doc_id < y.doc_id
    )
    SELECT doc_a, doc_b,
           {{EST}} AS jaccard_est
    FROM cand
    JOIN sigs a ON doc_a = a.doc_id
    JOIN sigs b ON doc_b = b.doc_id
    WHERE CAST(({_X8B_MATCHES_SQL}) AS DOUBLE) / {_MH_NUM} >= {_MH_MIN_EST}
""".format(EST=r4sql(f"CAST(({_X8B_MATCHES_SQL}) AS DOUBLE) / {_MH_NUM}"))


@register(
    "x8b_minhash_oracle",
    _X8B_SQL,
    doc="EXT x8b — MinHash+LSH with engine-portable hashing: shingle "
    "→ md5-derived integer → 32 seeded universal hashes in ONE "
    "min-agg shuffle, 8-band×4-row banding, candidates via band-key "
    "equi-join (never all-pairs), estimate = matching signature "
    "fraction. Every stage value-verified against the oracle; x8 is "
    "the xxhash64 production twin of the same plan.",
    tags=("ext", "dedup"),
    late=True,
)
def x8b_minhash_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    shingles = ng.word_shingles(_docs(spark, sf_dir), n=3)
    md5 = F.md5("shingle")
    v_terms = [
        (F.conv(F.substring(md5, j + 1, 1), 16, 10).cast("long"))
        * (16 ** (7 - j))
        for j in range(8)
    ]
    v = sum(v_terms[1:], v_terms[0]) % _MH_P
    vals = shingles.select("doc_id", v.alias("v"))
    # ONE min-agg shuffle for all 32 signatures, packed into an array
    # so downstream carries a single column instead of 32
    sigs = vals.groupBy("doc_id").agg(
        F.array(
            *[
                F.min((F.lit(a) * F.col("v") + F.lit(b)) % _MH_P)
                for a, b in _MH_AB
            ]
        ).alias("sig")
    )
    # explode band keys, CARRYING the signature array — candidates and
    # their match counts come out of one equi-join (no second pass
    # re-joining signatures per side)
    band_structs = [
        F.struct(
            F.lit(band).alias("band_idx"),
            F.concat_ws(
                "|",
                F.transform(
                    F.slice("sig", band * _MH_ROWS + 1, _MH_ROWS),
                    lambda x: x.cast("string"),
                ),
            ).alias("band_key"),
        )
        for band in range(_MH_BANDS)
    ]
    # Both self-join branches reference this — materialize so the
    # md5-per-shingle + min-agg pipeline runs once, not twice.
    kv = (
        sigs.select("doc_id", "sig", F.explode(F.array(*band_structs)).alias("b"))
        .select("doc_id", "sig", "b.band_idx", "b.band_key")
        .localCheckpoint()
    )
    x = kv.select(
        F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"),
        "band_idx", "band_key",
    )
    y = kv.select(
        F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"),
        "band_idx", "band_key",
    )
    cand = (
        x.join(y, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda p, q: p == q), lambda m: m
        )
    )
    est = matches.cast("double") / _MH_NUM
    return (
        cand.select("doc_a", "doc_b", r4(est).alias("jaccard_est"))
        .filter(F.col("jaccard_est") >= _MH_MIN_EST)
    )


# ---------------------------------------------------------------------------
# x23 — vocabulary build; x24 — cross-source contamination
# ---------------------------------------------------------------------------

VOCAB_K = 100


@register(
    "x23_vocab_topk",
    rf"""
    WITH toks AS (
        SELECT UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS token,
               doc_id
        FROM documents
    ),
    counts AS (
        SELECT token,
               COUNT(*) AS n_occurrences,
               COUNT(DISTINCT doc_id) AS n_docs
        FROM toks GROUP BY token
    )
    SELECT token, n_occurrences, n_docs, rnk FROM (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY n_occurrences DESC, token
        ) AS rnk
        FROM counts
    ) WHERE rnk <= {VOCAB_K}
    """,
    doc="EXT x23 — vocabulary build: corpus-wide token frequencies "
    "(occurrences + document frequency) with deterministic top-K — "
    "the tokenizer-training / stopword-derivation pass. One explode + "
    "one hash-agg; the top-K is orderBy().limit(K) which plans as "
    "TakeOrderedAndProject (per-partition heaps, never a global "
    "sort); the rank window runs AFTER the limit, over K rows only.",
    tags=("ext", "textstats", "vocab"),
    late=True,
)
def x23_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _docs(spark, sf_dir).select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    )
    counts = toks.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    order = [F.col("n_occurrences").desc(), F.col("token")]
    top = counts.orderBy(*order).limit(VOCAB_K)
    # rnk derived post-limit: this window sorts VOCAB_K rows, not the
    # vocabulary — the full-relation order is settled by TakeOrdered.
    return top.withColumn(
        "rnk",
        # lit(1): bounded window (K rows post-limit), not a data sort
        F.row_number().over(Window.partitionBy(F.lit(1)).orderBy(*order)),
    )


@register(
    "x24_cross_source_contamination",
    rf"""
    WITH w AS (
        SELECT doc_id, source,
               generate_subscripts(string_split_regex(LOWER(TRIM(text)), '\s+'), 1) AS pos,
               UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS word
        FROM documents
    ),
    sh0 AS (
        SELECT doc_id, source,
               word || ' ' || LEAD(word, 1) OVER win || ' ' || LEAD(word, 2) OVER win AS shingle,
               LEAD(word, 2) OVER win AS last2
        FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
    ),
    srcsh AS (
        SELECT DISTINCT source, shingle FROM sh0 WHERE last2 IS NOT NULL
    ),
    src_sizes AS (SELECT source, COUNT(*) AS n_sh FROM srcsh GROUP BY source)
    SELECT a.source AS source_a, b.source AS source_b,
           COUNT(*) AS n_shared,
           {{OV}} AS overlap_a
    FROM srcsh a
    JOIN srcsh b ON a.shingle = b.shingle AND a.source < b.source
    JOIN src_sizes sa ON a.source = sa.source
    GROUP BY a.source, b.source, sa.n_sh
    """.format(OV=r4sql("CAST(COUNT(*) AS DOUBLE) / sa.n_sh")),
    doc="EXT x24 — cross-source CONTAMINATION check: for every source "
    "pair, how many distinct word-3-grams they share and what "
    "fraction of the first source's shingles that is — the standard "
    "train/eval leakage scan (n-gram overlap between splits). Shape: "
    "distinct (source, shingle) sets then an inverted-index join on "
    "shingle — source count is tiny, shingle sets are the scale.",
    tags=("ext", "dedup", "contamination"),
    late=True,
)
def x24_cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "source", "text")
    sh = ng.word_shingles(docs, n=3)
    # Three references (both join branches + sizes), zero exchange
    # reuse → materialize the distinct (source, shingle) set once.
    srcsh = (
        sh.join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "shingle")
        .distinct()
        .localCheckpoint()
    )
    sizes = srcsh.groupBy("source").agg(F.count("*").alias("n_sh"))
    a = srcsh.select(F.col("source").alias("source_a"), "shingle")
    b = srcsh.select(F.col("source").alias("source_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
    )
    return shared.join(
        F.broadcast(sizes.withColumnsRenamed({"source": "source_a"})), "source_a"
    ).select(
        "source_a",
        "source_b",
        "n_shared",
        r4(F.col("n_shared").cast("double") / F.col("n_sh")).alias("overlap_a"),
    )


# ---------------------------------------------------------------------------
# x29 — eval-set decontamination (doc-level drop-list)
# ---------------------------------------------------------------------------


@register(
    "x29_eval_decontaminate",
    r"""
    WITH w AS (
        SELECT doc_id, source,
               generate_subscripts(string_split_regex(LOWER(TRIM(text)), '\s+'), 1) AS pos,
               UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS word
        FROM documents
    ),
    sh0 AS (
        SELECT doc_id, source,
               word || ' ' || LEAD(word, 1) OVER win || ' ' || LEAD(word, 2) OVER win AS shingle,
               LEAD(word, 2) OVER win AS last2
        FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
    ),
    sh AS (
        SELECT DISTINCT doc_id, source, shingle
        FROM sh0 WHERE last2 IS NOT NULL
    ),
    ev AS (SELECT MIN(source) AS ev_src FROM documents),
    eval_sh AS (
        SELECT DISTINCT shingle FROM sh, ev WHERE sh.source = ev.ev_src
    )
    SELECT s.doc_id, COUNT(*) AS n_eval_shingles
    FROM sh s, ev
    WHERE s.source <> ev.ev_src
      AND s.shingle IN (SELECT shingle FROM eval_sh)
    GROUP BY s.doc_id
    """,
    doc="EXT x29 — eval decontamination: the DROP-LIST of training "
    "documents sharing any word-3-gram with the held-out eval source "
    "(the GPT-3-style n-gram scrub; production uses 8–13-grams, same "
    "plan). Complements x24: that reports source-pair overlap "
    "aggregates, this names the individual training docs to remove. "
    "Scale shape: the eval shingle set is tiny relative to the "
    "corpus → broadcast to the training shingles, one hash-agg per "
    "doc — never a corpus self-join. Counts are per distinct "
    "(doc, shingle), so the shingle-dedup in both dialects makes "
    "COUNT(*) ≡ COUNT(DISTINCT shingle).",
    tags=("ext", "dedup", "contamination"),
    late=True,
)
def x29_eval_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    ev = docs.agg(F.min("source").alias("ev_src"))
    # shingles referenced by BOTH the eval and training branches —
    # materialize once (same no-ReusedExchange issue as x21/x24)
    sh = (
        ng.word_shingles(docs, n=3)
        .join(docs.select("doc_id", "source"), "doc_id")
        .crossJoin(F.broadcast(ev))
        .localCheckpoint()
    )
    eval_sh = (
        sh.filter(F.col("source") == F.col("ev_src"))
        .select("shingle")
        .distinct()
    )
    return (
        sh.filter(F.col("source") != F.col("ev_src"))
        .join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_eval_shingles"))
    )


# ---------------------------------------------------------------------------
# x22 — int8 scalar quantization of embeddings
# ---------------------------------------------------------------------------


@register(
    "x22_embedding_quantize",
    """
    WITH scaled AS (
        SELECT vec_id,
               GREATEST(list_max(list_transform(embedding,
                   x -> ABS(CAST(x AS DOUBLE)))) / 127, 1e-12) AS scale
        FROM embeddings
    )
    SELECT e.vec_id,
           {SC} AS scale,
           array_to_string(list_transform(embedding,
               x -> CAST(CASE WHEN x < 0
                    THEN -FLOOR(ABS(CAST(x AS DOUBLE)) / scale + 0.5)
                    ELSE  FLOOR(ABS(CAST(x AS DOUBLE)) / scale + 0.5)
                    END AS INT)), ',')
               AS q_values
    FROM embeddings e JOIN scaled s ON e.vec_id = s.vec_id
    """.format(SC=r4sql("scale")),
    doc="EXT x22 — int8 scalar quantization: per-vector absmax scale, "
    "elements snapped to [-127,127] (the 4× memory shrink an ANN "
    "index applies before SIMD scoring). Pure narrow map — "
    "higher-order array functions, no shuffle, no UDF. Round "
    "half-away-from-zero spelled as sign·floor(|x|/scale + 0.5): "
    "pure IEEE double arithmetic, bit-identical across engines "
    "(decimal-cast rounding would double-round at the boundary).",
    tags=("ext", "similarity", "quantize"),
    late=True,
)
def x22_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    scale = F.greatest(
        F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
        / 127,
        F.lit(1e-12),
    )
    # internal name ≠ output alias: the select below re-aliases the
    # ROUNDED value as "scale", and lateral column-alias resolution
    # would otherwise bind the lambda's reference to that rounded
    # sibling instead of the child column
    with_scale = emb.select("vec_id", "embedding", scale.alias("_scale"))

    def _q(x):
        mag = F.floor(F.abs(x.cast("double")) / F.col("_scale") + 0.5)
        return F.when(x < 0, -mag).otherwise(mag).cast("int")

    q = F.transform("embedding", _q)
    return with_scale.select(
        "vec_id",
        r4("_scale").alias("scale"),
        F.array_join(F.transform(q, lambda v: v.cast("string")), ",").alias(
            "q_values"
        ),
    )


# ---------------------------------------------------------------------------
# x25 — intra-document repetition ratio (Gopher-style quality signal)
# ---------------------------------------------------------------------------


@register(
    "x25_repetition_ratio",
    rf"""
    WITH w AS (
        SELECT doc_id,
               generate_subscripts(string_split_regex(LOWER(TRIM(text)), '\s+'), 1) AS pos,
               UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS word
        FROM documents
    ),
    sh0 AS (
        SELECT doc_id,
               word || ' ' || LEAD(word, 1) OVER win || ' ' || LEAD(word, 2) OVER win AS shingle,
               LEAD(word, 2) OVER win AS last2
        FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
    ),
    sh AS (SELECT doc_id, shingle FROM sh0 WHERE last2 IS NOT NULL),
    per_doc AS (
        SELECT doc_id,
               COUNT(*) AS n_shingles,
               COUNT(DISTINCT shingle) AS n_distinct
        FROM sh GROUP BY doc_id
    )
    SELECT doc_id, n_shingles, n_distinct,
           {r4sql("1.0 - CAST(n_distinct AS DOUBLE) / n_shingles")}
               AS repetition_ratio
    FROM per_doc
    """,
    doc="EXT x25 — intra-document repetition: fraction of word-3-gram "
    "occurrences that are repeats (1 − distinct/total), the Gopher "
    "duplicate-n-gram quality rule that catches boilerplate and "
    "degenerate loops. One explode + one two-level agg per doc; "
    "composes into the x18/x21 gate as another keep/drop rule.",
    tags=("ext", "textstats", "quality"),
    late=True,
)
def x25_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = _docs(spark, sf_dir).select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "pos", "word"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    sh = (
        words.select(
            "doc_id",
            F.concat_ws(
                " ", "word", F.lead("word", 1).over(w), F.lead("word", 2).over(w)
            ).alias("shingle"),
            F.lead("word", 2).over(w).alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .select("doc_id", "shingle")
    )
    per_doc = sh.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.countDistinct("shingle").alias("n_distinct"),
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_distinct",
        r4(
            1.0 - F.col("n_distinct").cast("double") / F.col("n_shingles")
        ).alias("repetition_ratio"),
    )


# ---------------------------------------------------------------------------
# x26 — PII scrub (email / phone / IPv4 detection + redaction)
# ---------------------------------------------------------------------------

# The synthetic corpus is PII-free, so the query plants deterministic
# PII derived from doc_id — identically in both engines — and then
# detects/redacts it with the generic scrubber. The scrubber itself
# (textstats/pii.py) takes ANY text column.
_X26_AUG_SQL = r"""text
        || CASE WHEN doc_id % 3 = 0
                THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                ELSE '' END
        || CASE WHEN doc_id % 5 = 0
                THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                     || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                ELSE '' END
        || CASE WHEN doc_id % 7 = 0
                THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
                     || '.' || CAST(doc_id % 250 AS VARCHAR)
                     || '.' || CAST(doc_id % 100 AS VARCHAR)
                ELSE '' END"""


@register(
    "x26_pii_scrub",
    rf"""
    WITH aug AS (
        SELECT doc_id, {_X26_AUG_SQL} AS t
        FROM documents
    ),
    scrubbed AS (
        SELECT doc_id, t,
               regexp_replace(regexp_replace(regexp_replace(t,
                   '{pii.EMAIL_RE}', '<EMAIL>', 'g'),
                   '{pii.IPV4_RE}', '<IP>', 'g'),
                   '{pii.PHONE_RE}', '<PHONE>', 'g') AS clean
        FROM aug
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{pii.EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(t, '{pii.IPV4_RE}')) AS n_ips,
           len(regexp_extract_all(t, '{pii.PHONE_RE}')) AS n_phones,
           CAST(LENGTH(t) - LENGTH(clean) AS BIGINT) AS n_chars_delta,
           md5(clean) AS clean_hash
    FROM scrubbed
    """,
    doc="EXT x26 — PII detection + redaction (C4-style scrub): emails, "
    "phone numbers, IPv4 addresses matched with Java/RE2-portable "
    "patterns, redacted to <TYPE> tokens in a fixed order. Pure "
    "narrow map (regexp built-ins, whole-stage codegen, no shuffle) — "
    "at 100 TB this runs at scan speed. The corpus is synthetic and "
    "PII-free, so deterministic doc_id-derived PII is planted "
    "identically in both engines before scrubbing.",
    tags=("ext", "textstats", "pii"),
    late=True,
)
def x26_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" contact user"), did.cast("string"), F.lit("@example.com")
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((did % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" from 10."),
                (did % 200).cast("string"),
                F.lit("."),
                (did % 250).cast("string"),
                F.lit("."),
                (did % 100).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    with_aug = _docs(spark, sf_dir).select("doc_id", aug.alias("t"))
    clean = pii.scrub("t")
    return with_aug.select(
        "doc_id",
        pii.match_count("t", pii.EMAIL_RE).alias("n_emails"),
        pii.match_count("t", pii.IPV4_RE).alias("n_ips"),
        pii.match_count("t", pii.PHONE_RE).alias("n_phones"),
        (F.length("t") - F.length(clean)).cast("long").alias("n_chars_delta"),
        F.md5(clean).alias("clean_hash"),
    )


# ---------------------------------------------------------------------------
# x27 — embedding-norm outlier trim (histogram-cumulative percentile)
# ---------------------------------------------------------------------------


@register(
    "x27_norm_outlier_trim",
    rf"""
    WITH norms AS (
        SELECT vec_id,
               {r4sql("sqrt(list_sum(list_transform(embedding,"
                      " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))")}
                   AS l2_norm
        FROM embeddings
    ),
    hist AS (SELECT l2_norm, COUNT(*) AS n_vecs FROM norms GROUP BY 1),
    cum AS (
        SELECT l2_norm, n_vecs,
               SUM(n_vecs) OVER (ORDER BY l2_norm) AS cum
        FROM hist
    ),
    tot AS (SELECT COUNT(*) AS n_total FROM norms)
    SELECT v.vec_id, v.l2_norm,
           (c.cum * 100 > t.n_total
            AND (c.cum - c.n_vecs) * 100 < t.n_total * 99) AS kept
    FROM norms v
    JOIN cum c ON v.l2_norm = c.l2_norm
    CROSS JOIN tot t
    """,
    doc="EXT x27 — embedding outlier trim: drop the bottom/top 1% of "
    "vectors by L2 norm (degenerate / exploding embeddings poison "
    "ANN indexes and contrastive training). Exact percentiles via "
    "the scalable histogram-cumulative shape: the global window runs "
    "over DISTINCT ROUNDED norms (cardinality bounded by the value "
    "range × 1e4, not the corpus), per-vector work is one hash-agg "
    "plus a broadcast join back. Norms use the codegen-unrolled "
    "dot_fixed, not the interpreted fold. A norm group is dropped "
    "only if it lies ENTIRELY inside a tail (straddling groups are "
    "kept), so the rule is pure integer arithmetic — no float "
    "threshold to flip between engines — and a constant-norm corpus "
    "drops nothing.",
    tags=("ext", "similarity", "quality"),
    late=True,
)
def x27_norm_outlier_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cos.norm_trim_flags(_emb(spark, sf_dir), dim=cos.EMB_DIM)


# ---------------------------------------------------------------------------
# x28 — source mixing budget (per-source token allocation)
# ---------------------------------------------------------------------------


@register(
    "x28_source_mix_budget",
    rf"""
    WITH per_source AS (
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(len(string_split_regex(LOWER(TRIM(text)), '\s+'))) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               COUNT(*) AS n_sources
        FROM per_source
    )
    SELECT s.source, s.n_docs, s.n_tokens,
           {r4sql("LEAST(CAST(2.0 AS DOUBLE),"
                  " (CAST(t.total_tokens AS DOUBLE) / t.n_sources)"
                  " / s.n_tokens)")} AS mix_weight,
           CAST(FLOOR(LEAST(CAST(2.0 AS DOUBLE),
                    (CAST(t.total_tokens AS DOUBLE) / t.n_sources)
                    / s.n_tokens) * s.n_tokens) AS BIGINT)
               AS budget_tokens
    FROM per_source s CROSS JOIN tot t
    """,
    doc="EXT x28 — dataset mixing: allocate a per-source token budget "
    "toward a uniform target share, capping oversampling at 2 "
    "epochs (the standard mixture-reweighting step before corpus "
    "assembly; pairs with the x19 stratified sampler that realizes "
    "the rates). One hash-agg over the corpus + a broadcast scalar "
    "join — the weight math runs on a few rows. The budget is "
    "floor(weight × tokens) in pure IEEE double arithmetic, "
    "identical across engines.",
    tags=("ext", "textstats", "sampling"),
    late=True,
)
def x28_source_mix_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_source = (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(tx.token_count()).alias("n_tokens"),
        )
    )
    tot = per_source.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count("*").alias("n_sources"),
    )
    j = per_source.crossJoin(F.broadcast(tot))
    target = F.col("total_tokens").cast("double") / F.col("n_sources")
    weight = F.least(F.lit(2.0), target / F.col("n_tokens"))
    return j.select(
        "source",
        "n_docs",
        "n_tokens",
        r4(weight).alias("mix_weight"),
        F.floor(weight * F.col("n_tokens")).cast("long").alias("budget_tokens"),
    )


# ---------------------------------------------------------------------------
# Rows-only EXT operators (engine-specific hashing / UDF paths)
# ---------------------------------------------------------------------------


@register(
    "x8_minhash_neardup",
    None,  # Spark ML MinHashLSH hashing is engine-specific
    doc="EXT x8 — MinHash LSH near-dup candidates (the 100 TB dedup "
    "path: universal-hash signatures in one hash-agg, banding → "
    "equi-join). Rows-only; validated against exact Jaccard in tests.",
    tags=("ext", "dedup", "rows-only"),
)
def x8_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mh.minhash_candidates(
        _docs(spark, sf_dir), n=3, num_hashes=32, n_bands=8, min_est=0.25
    ).select("doc_a", "doc_b", r4("jaccard_est").alias("jaccard_est"))


@register(
    "x9_simhash_fingerprint",
    None,  # xxhash64 is Spark-specific
    doc="EXT x9 — 64-bit SimHash fingerprints (JVM bit arithmetic, no "
    "UDF); banded Hamming join is the near-dup scale path.",
    tags=("ext", "dedup", "rows-only"),
)
def x9_simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sh.simhash64(_docs(spark, sf_dir))


def _seeded_tables(
    n_tables: int = 8, n_planes: int = 3, dim: int = 64, seed: int = 7
) -> list[list[list[float]]]:
    """Independent hyperplane sets for multi-table LSH (fixed seed so
    results are reproducible run-to-run)."""
    rng = random.Random(seed)
    return [
        [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]


@register(
    "x11_lsh_cosine_topk",
    None,  # plane choice is engine-side state
    doc="EXT x11 — LSH-bucketed approximate top-k (random hyperplane "
    "signatures → bucket equi-join): the ANN scale path for x3.",
    tags=("ext", "similarity", "rows-only"),
)
def x11_lsh_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return cos.lsh_topk(emb, queries, _seeded_tables(), k=TOPK, dim=64)


@register(
    "x14_ivf_topk",
    None,  # KMeans quantizer is engine-side model state
    doc="EXT x14 — IVF approximate top-k: sample-trained coarse "
    "quantizer, numpy-assigned + cached corpus (build_index, offline "
    "at scale), n_probe nearest-centroid search with codegen exact "
    "cosine rerank (the FAISS nlist/nprobe pattern).",
    tags=("ext", "similarity", "rows-only"),
)
def x14_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from server_spark.similarity.ivf import ivf_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ivf_topk(
        emb, queries, k=TOPK, n_clusters=16, n_probe=4, cache_key=sf_dir
    )


@register(
    "x12_multimodal_meta",
    None,  # mapInPandas decode stub
    doc="EXT x12 — multimodal binary-column plumbing: Arrow-batched "
    "mapInPandas metadata/decode extraction (decode stubbed; schema, "
    "batching and partitioning real).",
    tags=("ext", "multimodal", "rows-only"),
)
def x12_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from server_spark.multimodal.binary import extract_media_meta, synthetic_media

    return extract_media_meta(synthetic_media(_docs(spark, sf_dir)))


@register(
    "x13_udtf_chunks",
    None,  # Python UDTF — engine-side table function
    doc="D7 — Python UDTF (Spark 3.5+/4 table function): split each "
    "document into fixed 10-word chunks with positions, the "
    "context-window chunking step of a training-data pipeline. "
    "Rows-only; chunk reassembly asserted in tests.",
    tags=("ext", "udtf", "rows-only"),
)
def x13_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="chunk_idx int, chunk_text string, n_words int")
    class ChunkDoc:
        # self-contained: workers may not have server_spark importable
        def eval(self, text: str, width: int):
            if text is None:
                return
            words = text.split()
            for i in range(0, len(words), width):
                chunk = words[i : i + width]
                yield i // width, " ".join(chunk), len(chunk)

    spark.udtf.register("chunk_doc", ChunkDoc)
    _docs(spark, sf_dir).createOrReplaceTempView("_docs_for_chunking")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_words
        FROM _docs_for_chunking d,
             LATERAL chunk_doc(d.text, 10) c
        """
    )


@register(
    "f3b_fuzzy_rank_udf",
    None,  # pandas_udf re-implementation of RankMatchFold
    doc="D2 — exact RankMatchFold fuzzy search parity (subsequence "
    "gate + Levenshtein rank) as an Arrow-batched pandas_udf.",
    tags=("ext", "search", "rows-only"),
)
def f3b_fuzzy_rank_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from server_spark.functions.text import fuzzy_search

    part = tables.load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("item"), F.col("p_name").alias("item_name")
    )
    return fuzzy_search(part, "item_name", "widget", k=10)


# ---------------------------------------------------------------------------
# x30 — TF-IDF top terms per document
# ---------------------------------------------------------------------------

TFIDF_K = 5


@register(
    "x30_tfidf_topterms",
    rf"""
    WITH toks AS (
        SELECT doc_id,
               UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS token
        FROM documents
    ),
    pairs AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ),
    dfreq AS (SELECT token, COUNT(*) AS dfq FROM pairs GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT p.doc_id, p.token, p.tf,
               {r4sql("p.tf * (LN((1.0 + n.n_docs) / (1.0 + d.dfq)) + 1.0)")}
                   AS tfidf
        FROM pairs p JOIN dfreq d ON p.token = d.token CROSS JOIN n
    )
    SELECT doc_id, token, tf, tfidf, rnk FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, token
        ) AS rnk
        FROM scored
    ) WHERE rnk <= {TFIDF_K}
    """,
    doc="EXT x30 — TF-IDF: smooth-idf (sklearn form, ln((1+N)/(1+df)) "
    "+ 1) term weights, top-5 terms per document with the rounded-"
    "score + token tiebreak rank (ranking on rounded values keeps "
    "the result engine-stable even if ln() differs in the last ulp). "
    "The doc-frequency table derives from the (doc, token) pair agg — "
    "one explode feeds everything, the pair relation is materialized "
    "once and the df side broadcasts (vocab-sized).",
    tags=("ext", "textstats", "tfidf"),
    late=True,
)
def x30_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    )
    # referenced by the scoring join AND the doc-frequency agg
    pairs = (
        toks.groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    dfreq = pairs.groupBy("token").agg(F.count("*").alias("dfq"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        pairs.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            r4(
                F.col("tf")
                * (
                    F.log(
                        (1.0 + F.col("n_docs")) / (1.0 + F.col("dfq"))
                    )
                    + 1.0
                )
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TFIDF_K)
        .select("doc_id", "token", "tf", "tfidf", "rnk")
    )


# ---------------------------------------------------------------------------
# x31 — length-bucketed inference batching (padding-waste minimizer)
# ---------------------------------------------------------------------------

BATCH_SIZE = 32


@register(
    "x31_length_batching",
    rf"""
    WITH lens AS (
        SELECT doc_id,
               len(string_split_regex(LOWER(TRIM(text)), '\s+')) AS n_tokens
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, n_tokens,
               ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) AS rn
        FROM lens
    )
    SELECT CAST((rn - 1) // {BATCH_SIZE} AS BIGINT) AS batch_id,
           COUNT(*) AS n_docs,
           MAX(n_tokens) AS max_tokens,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT)
               AS padded_waste
    FROM ranked
    GROUP BY 1
    """,
    doc="EXT x31 — dynamic batching for inference/training: documents "
    "sorted by token length and cut into fixed-size batches, so each "
    "batch pads only to ITS OWN max length — `padded_waste` counts "
    "the pad tokens a length-sorted batch still spends (vs. the "
    "corpus-max padding of naive batching). The global rank uses "
    "operators/ranking.global_row_number — range-partition by "
    "(n_tokens, doc_id), rank locally, shift by per-partition prefix "
    "counts — so no stage ever sorts more than one range slice (the "
    "naive ROW_NUMBER-over-everything window would funnel 100 TB "
    "through one task).",
    tags=("ext", "textstats", "batching"),
    late=True,
)
def x31_length_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from server_spark.operators.ranking import global_row_number

    lens = _docs(spark, sf_dir).select(
        "doc_id", tx.token_count().alias("n_tokens")
    )
    ranked = global_row_number(lens, ["n_tokens", "doc_id"], out_col="rn")
    return (
        ranked.groupBy(
            ((F.col("rn") - 1) / BATCH_SIZE)
            .cast("long")
            .alias("batch_id")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").alias("sum_tokens"),
            (F.count("*") * F.max("n_tokens") - F.sum("n_tokens")).alias(
                "padded_waste"
            ),
        )
    )


# ---------------------------------------------------------------------------
# x32 — quality-aware dedup survivorship
# ---------------------------------------------------------------------------

_X32_SQL = (
    _X15_SQL.rsplit("SELECT component AS canonical_doc_id", 1)[0]
    + r""",
    lens AS (
        SELECT doc_id,
               len(string_split_regex(LOWER(TRIM(text)), '\s+')) AS n_tokens
        FROM documents
    ),
    memb AS (
        SELECT c.component, c.node, l.n_tokens
        FROM comp c JOIN lens l ON c.node = l.doc_id
    ),
    best AS (SELECT component, MAX(n_tokens) AS mt FROM memb GROUP BY component)
    SELECT m.component AS cluster_id,
           MIN(CASE WHEN m.n_tokens = b.mt THEN m.node END) AS survivor_doc_id,
           COUNT(*) AS n_members,
           b.mt AS survivor_tokens
    FROM memb m JOIN best b ON m.component = b.component
    GROUP BY m.component, b.mt
"""
)


@register(
    "x32_cluster_survivors_quality",
    _X32_SQL,
    doc="EXT x32 — quality-aware survivorship: within each near-dup "
    "cluster (x15's connected components) keep the HIGHEST-QUALITY "
    "member — here the longest by token count, min doc_id on ties — "
    "instead of x15/x21's min-id rule; production dedup keeps the "
    "best copy, not the lexicographically first. Portable two-step "
    "argmax (per-cluster max, then min-id among the maximal), both "
    "aggs over the tiny membership table.",
    tags=("ext", "dedup", "pipeline"),
    late=True,
)
def x32_cluster_survivors_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from server_spark.dedup.components import connected_components

    docs = _docs(spark, sf_dir)
    edges = ng.jaccard_pairs(docs, n=3, threshold=JACCARD_MIN).select(
        "doc_a", "doc_b"
    )
    comp = connected_components(edges)
    lens = docs.select("doc_id", tx.token_count().alias("n_tokens"))
    memb = comp.join(lens, comp.node == lens.doc_id).select(
        "component", "node", "n_tokens"
    )
    best = memb.groupBy("component").agg(F.max("n_tokens").alias("mt"))
    return (
        memb.join(F.broadcast(best), "component")
        .groupBy("component", "mt")
        .agg(
            F.min(
                F.when(F.col("n_tokens") == F.col("mt"), F.col("node"))
            ).alias("survivor_doc_id"),
            F.count("*").alias("n_members"),
        )
        .select(
            F.col("component").alias("cluster_id"),
            "survivor_doc_id",
            "n_members",
            F.col("mt").alias("survivor_tokens"),
        )
    )
