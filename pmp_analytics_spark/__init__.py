"""pmp-analytics-spark: a PySpark-native analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference repo ``jbgreenh/pmp-analytics`` (a Polars batch-analytics suite),
re-expressed as idiomatic Spark DataFrame pipelines, plus LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
designed for 100 TB scale.

Layout:
    session      SparkSession factory with scale-aware defaults
    sources      readers (parquet star schema, all-string CSV policy)
    functions    column-expression library (normalize, datetime, checksums,
                 similarity, text)
    operators    reusable relational patterns (joins, dedup, agg, sample,
                 setops, similarity_search, sessionize)
    queries      declared analytic queries (parity + llm packs) with
                 DuckDB oracle SQL
    streaming    Structured Streaming pipelines
"""

__version__ = "0.1.0"
