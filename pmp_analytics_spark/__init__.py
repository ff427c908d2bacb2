"""pmp-analytics-spark: a PySpark-native analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference repo ``jbgreenh/pmp-analytics`` (a Polars batch-analytics suite),
re-expressed as idiomatic Spark DataFrame pipelines, plus LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
designed for 100 TB scale.

Layout:
    session      SparkSession factory with scale-aware defaults
    sources      readers (parquet star schema, all-string CSV policy) and
                 sinks (distributed/single-file CSV, append-only logs)
    functions    column-expression library (normalize, datetime, checksums,
                 similarity, text incl. MinHash/SimHash/winnowing)
    operators    reusable relational patterns (joins, dedup + connected
                 components, agg, sample, setops, similarity_search incl.
                 IVF/LSH, sessionize, partitioning/salting)
    queries      declared analytic queries (parity + llm packs) with
                 DuckDB oracle SQL
    streaming    Structured Streaming pipelines incl. applyInPandasWithState
    plans        physical-plan audit helpers (broadcast/pushdown gates)
    multimodal   binary payload columns + mapInPandas feature extraction
"""

__version__ = "0.1.0"
