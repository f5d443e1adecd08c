"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference hybrid text-retrieval engine
(oyilmaztekin/hadith-vector-search), re-architected Spark-first.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, Arrow, shuffle sizing)
- ``sources``    : parquet/JSONL scans with explicit schemas (SURVEY §2.1)
- ``functions``  : scalar column-expression library (SURVEY §2.7)
- ``operators``  : BM25, cosine top-k, fusion, dedup, routing (SURVEY §2.2-2.9)
- ``plans``      : end-to-end query pipelines (hybrid search, relational)
- ``streaming``  : incremental/streaming ingestion (SURVEY §2.11)

Everything is expressed with the DataFrame API so Catalyst handles pushdown,
pruning, join strategy and AQE; Python UDFs appear only where JVM expressions
genuinely cannot express the semantics (model inference stubs).
"""

__version__ = "0.1.0"
