"""metrics_service_spark — PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
DataONEorg/metrics-service (reference: /root/reference), re-expressed
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, columnar
Parquet storage, Structured Streaming ingest, plus large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing).

Layout:
    session     SparkSession factory tuned for analytics at scale
    schemas     explicit StructType schemas (events, identifiers, citations)
    sources     table loaders / bronze JSON ingest
    operators   sessionization, closure, rollup, COUNTER aggs, dedup, ANN, ...
    functions   scalar helpers (DOI normalize, geohash, ip-to-long, ...)
    plans       MetricsRequest JSON -> DataFrame translator (the query surface)
    streaming   Structured Streaming ingest + stateful sessionization
    testing     DuckDB oracle differential harness used by the test suite
"""

__version__ = "0.1.0"
