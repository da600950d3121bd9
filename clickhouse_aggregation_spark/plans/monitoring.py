"""Operational monitoring (SURVEY.md §2.1 S11) — the Spark equivalents
of the reference's system.* catalog scans (usdc-transfers/sql/
monitoring.sql:5-29): replication status → StreamingQuery progress;
table sizes → catalog + filesystem stats with formatReadableSize.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from ..functions.misc import format_readable_size


def table_sizes(spark: SparkSession, paths: dict[str, str]) -> DataFrame:
    """monitoring.sql:20-29: per-table bytes/rows/files, largest first,
    with a human-readable size column (formatReadableSize, F8)."""
    rows = []
    for name, path in paths.items():
        total = 0
        n_files = 0
        if os.path.isfile(path):
            total, n_files = os.path.getsize(path), 1
        else:
            for dirpath, _dirs, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet"):
                        total += os.path.getsize(os.path.join(dirpath, f))
                        n_files += 1
        n_rows = spark.read.parquet(path).count() if n_files else 0
        rows.append(Row(table=name, total_bytes=total, n_files=n_files,
                        n_rows=n_rows))
    df = spark.createDataFrame(rows)
    return (
        df.withColumn("size", format_readable_size(F.col("total_bytes")))
        .orderBy(F.col("total_bytes").desc())
    )


def streaming_progress(query) -> dict:
    """monitoring.sql:5-18 (replication status/queue) → the maintainer
    StreamingQuery's lastProgress: rows/sec, batch durations, state."""
    p = query.lastProgress
    if p is None:
        return {"status": "no-progress-yet"}
    return {
        "id": str(p.get("id")),
        "batchId": p.get("batchId"),
        "numInputRows": p.get("numInputRows"),
        "inputRowsPerSecond": p.get("inputRowsPerSecond"),
        "processedRowsPerSecond": p.get("processedRowsPerSecond"),
        "durationMs": p.get("durationMs"),
    }


def catalog_tables(spark: SparkSession) -> DataFrame:
    """SHOW TABLES analog over the session catalog."""
    return spark.createDataFrame(
        [Row(name=t.name, isTemporary=t.isTemporary, tableType=t.tableType)
         for t in spark.catalog.listTables()])
