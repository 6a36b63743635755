"""server_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of `sotah-inc/server` (WoW auction-house
ETL + query server), re-designed Spark-first.

The reference system is a Go pipeline: ingest auction dumps → collapse
to "mini-auctions" → per-item price stats → per-item price histories →
serve filtered/sorted/paginated queries over a message bus (see
SURVEY.md §0.5). This package re-expresses every one of those data
operations as declarative Spark DataFrame plans (Catalyst optimizes;
Tungsten executes), plus the large-scale training-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal
columns) described in SURVEY.md §2.

Layout:
    session.py     SparkSession factory (AQE on, tuned shuffle)
    schemas.py     explicit StructTypes for every table
    tables.py      parquet loaders
    operators/     relational core: collapse, stats, joins, windows,
                   set ops, sort/pagination, churn, time series
    functions/     scalar function library (prices, text, json)
    dedup/         exact + MinHash/SimHash/n-gram/embedding near-dup
    similarity/    ANN / cosine top-k over embeddings
    textstats/     language-ID, quality scores, token counts,
                   fingerprints
    multimodal/    binary-column plumbing (decode stubbed)
    plans/         medallion pipeline writers (bronze/silver/gold)
    streaming/     Structured Streaming forms of the intake loop
    registry.py    name → (query fn, oracle SQL) for the driver
"""

__version__ = "0.1.0"
