"""Mutations: ClickHouse ``ALTER TABLE ... DELETE / UPDATE`` parity
(reference exposure: the CDC retraction path assumes rows can be
removed; ClickHouse mutations are the DDL-level form) as
copy-on-write partition rewrites — the only mutation strategy that
scales on immutable columnar storage.

Design (the Delta/Iceberg copy-on-write model, expressed on a plain
partitioned parquet layout):

1. Find AFFECTED partitions: the distinct partition keys among rows
   matching the predicate. This is metadata-scale work — the filter
   prunes on partition stats and only partition keys reach the driver.
2. Rewrite ONLY those partitions, with matching rows removed (delete)
   or transformed (update), using Spark's dynamic partition overwrite
   (``partitionOverwriteMode=dynamic``): untouched partitions' files
   are not rewritten, moved, or even read.
3. Readers see the table atomically per partition (parquet dir swap) —
   the same granularity ClickHouse mutations commit at (per part).

At 100 TB the cost is proportional to the affected partitions, never
the table; a predicate aligned with the partition key (the common
GDPR / retention case: delete one user, one day, one source) rewrites
a handful of directories. ``deleted_mask`` mode mirrors ClickHouse
*lightweight* deletes: instead of rewriting data files, append a
per-partition tombstone table that readers anti-join — O(matches)
write cost, small read-side overhead, compacted away by the next
copy-on-write rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

PARTITION_COL = "block_bucket"


def _with_dynamic_overwrite(spark: SparkSession):
    """Context: dynamic partition overwrite (only partitions present in
    the written frame are replaced)."""
    class _Ctx:
        def __enter__(self):
            self.prev = spark.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                           "dynamic")
        def __exit__(self, *exc):
            spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                           self.prev)
    return _Ctx()


def affected_partitions(df: DataFrame, predicate: Column,
                        part_col: str = PARTITION_COL) -> list:
    """Distinct partition keys containing rows that match the
    predicate. Metadata-scale driver result (|partitions| values)."""
    return [r[0] for r in
            df.filter(predicate).select(part_col).distinct().collect()]


def delete_where(spark: SparkSession, path: str, predicate: Column,
                 part_col: str = PARTITION_COL) -> dict:
    """ALTER TABLE DELETE WHERE <predicate>, copy-on-write.

    Returns {"partitions_rewritten": n, "rows_deleted": n}. Partitions
    without matches keep their existing files untouched."""
    df = spark.read.parquet(path)
    parts = affected_partitions(df, predicate, part_col)
    if not parts:
        return {"partitions_rewritten": 0, "rows_deleted": 0}
    affected = df.filter(F.col(part_col).isin(parts))
    deleted = affected.filter(predicate).count()
    remaining = affected.filter(~predicate)
    with _with_dynamic_overwrite(spark):
        (remaining.repartition(F.col(part_col))
         .write.mode("overwrite").partitionBy(part_col).parquet(path))
    return {"partitions_rewritten": len(parts), "rows_deleted": deleted}


def update_where(spark: SparkSession, path: str, predicate: Column,
                 set_exprs: dict[str, Column],
                 part_col: str = PARTITION_COL) -> dict:
    """ALTER TABLE UPDATE col = expr WHERE <predicate>, copy-on-write.

    Non-matching rows in affected partitions are rewritten verbatim;
    other partitions are untouched."""
    df = spark.read.parquet(path)
    parts = affected_partitions(df, predicate, part_col)
    if not parts:
        return {"partitions_rewritten": 0, "rows_updated": 0}
    affected = df.filter(F.col(part_col).isin(parts))
    updated_count = affected.filter(predicate).count()
    updated = affected.select(*[
        F.when(predicate, set_exprs[c]).otherwise(F.col(c)).alias(c)
        if c in set_exprs else F.col(c)
        for c in affected.columns
    ])
    with _with_dynamic_overwrite(spark):
        (updated.repartition(F.col(part_col))
         .write.mode("overwrite").partitionBy(part_col).parquet(path))
    return {"partitions_rewritten": len(parts), "rows_updated": updated_count}


# ---------------------------------------------------------------------------
# lightweight deletes (ClickHouse DELETE FROM): tombstone mask instead
# of data rewrite

def lightweight_delete(spark: SparkSession, path: str, predicate: Column,
                       key_cols: tuple[str, ...]) -> int:
    """Append matching rows' keys to a tombstone side-table; readers
    go through read_with_tombstones(). Write cost O(matches)."""
    df = spark.read.parquet(path)
    tombs = df.filter(predicate).select(*key_cols)
    n = tombs.count()
    if n:
        tombs.write.mode("append").parquet(_tombstone_dir(path))
    return n


def read_with_tombstones(spark: SparkSession, path: str,
                         key_cols: tuple[str, ...]) -> DataFrame:
    """The live view: base data minus tombstoned keys (anti-join —
    broadcast while the tombstone table is small)."""
    df = spark.read.parquet(path)
    td = _tombstone_dir(path)
    if not os.path.isdir(td):
        return df
    tombs = spark.read.parquet(td).distinct()
    return df.join(tombs, on=list(key_cols), how="left_anti")


def compact_tombstones(spark: SparkSession, path: str,
                       key_cols: tuple[str, ...],
                       part_col: str = PARTITION_COL) -> dict:
    """Fold accumulated tombstones into the data files (the background
    merge ClickHouse runs for lightweight deletes): copy-on-write
    rewrite of partitions containing tombstoned rows, then drop the
    tombstone table."""
    td = _tombstone_dir(path)
    if not os.path.isdir(td):
        return {"partitions_rewritten": 0, "rows_deleted": 0}
    df = spark.read.parquet(path)
    tombs = spark.read.parquet(td).distinct()
    hit = df.join(tombs, on=list(tombs.columns), how="left_semi")
    parts = [r[0] for r in hit.select(part_col).distinct().collect()]
    stats = {"partitions_rewritten": len(parts), "rows_deleted": 0}
    if parts:
        affected = df.filter(F.col(part_col).isin(parts))
        remaining = affected.join(tombs, on=list(tombs.columns),
                                  how="left_anti")
        stats["rows_deleted"] = affected.count() - remaining.count()
        with _with_dynamic_overwrite(spark):
            (remaining.repartition(F.col(part_col))
             .write.mode("overwrite").partitionBy(part_col).parquet(path))
    import shutil
    shutil.rmtree(td)
    return stats


def _tombstone_dir(path: str) -> str:
    return os.path.join(path, "_tombstones")
