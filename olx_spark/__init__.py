"""olx_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

Brand-new engine (NOT a port) with the query/data-processing semantics of
the reference crawler ``stanikol/olx`` (see SURVEY.md), re-expressed
Spark-first: DataFrame/SQL plans optimized by Catalyst, vectorized
pandas/Arrow UDFs for the parse layer, snapshot-versioned Parquet tables
for the frontier / seen-set / results, and explicit partitioning + skew
handling for web-scale (10^10-URL frontier) operation.

Subpackages
-----------
- ``session``    : SparkSession factory (Arrow + AQE pinned).
- ``fixtures``   : deterministic synthetic crawl graph + image corpus.
- ``functions``  : column-level functions (URL canonicalization,
                   fingerprints, text analysis, similarity).
- ``operators``  : relational/crawl operators (dedup, ranking,
                   politeness, fetch, ANN, multimodal plumbing).
- ``plans``      : the crawl driver loop + snapshot store.
- ``sources``    : readers for the driver testdata and fixture tables.
- ``streaming``  : optional Structured-Streaming variant of the loop.
"""

__version__ = "0.1.0"
