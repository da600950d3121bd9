"""PySpark-native analytics engine with the capabilities of
``0xbeary/clickhouse-aggregation`` (real-time ClickHouse aggregation
pipeline over an EVM transfer stream), rebuilt Spark-first.

The reference (read-only at /root/reference/) is an ingest →
CDC-replicate → materialized-view rollup → ad-hoc SQL pipeline; here
the same capabilities are expressed as Spark SQL / DataFrame plans over
Parquet, Structured Streaming maintainers for the incremental rollups,
and a library of beyond-reference large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Layout:
    session     -- tuned SparkSession factory
    schemas     -- explicit StructTypes (never inferSchema)
    sources/    -- table loaders, canonical transfers synthesis, raw logs
    functions/  -- scalar function library (bucketing, decode, misc)
    operators/  -- rollups, analytics queries, dedup, similarity, text
    plans/      -- physical design: partitioned writes, tiering, archive
    streaming/  -- incremental rollup maintainers, watermark dedup
"""

__version__ = "0.1.0"
