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
   The affected-partition list is BOUNDED: above ``max_partitions``
   (default 4096) the per-partition planner stops enumerating and the
   mutation switches to a single full-table rewrite (one pass, no
   driver-side partition list) — so a predicate that touches most of a
   years×sources layout can never push 10^5+ values through the driver
   or into an ``isin`` literal list.
2. Rewrite ONLY those partitions, with matching rows removed (delete)
   or transformed (update), using Spark's dynamic partition overwrite
   (``partitionOverwriteMode=dynamic``): untouched partitions' files
   are not rewritten, moved, or even read. Partitions whose every row
   matched the predicate are removed EXPLICITLY afterwards — dynamic
   overwrite only replaces partitions present in the written frame, so
   an emptied partition would otherwise silently keep its old files
   (the partition-aligned GDPR case: delete one whole user/day/source).
3. Readers see the table atomically per partition (parquet dir swap) —
   the same granularity ClickHouse mutations commit at (per part).

At 100 TB the cost is proportional to the affected partitions, never
the table; a predicate aligned with the partition key (the common
GDPR / retention case: delete one user, one day, one source) rewrites
a handful of directories. ``deleted_mask`` mode mirrors ClickHouse
*lightweight* deletes: instead of rewriting data files, append a
per-partition tombstone table that readers anti-join — O(matches)
write cost, small read-side overhead, compacted away by the next
copy-on-write rewrite. Compaction only drops the tombstone table
after VERIFYING every tombstoned key is gone from the rewritten data
(a failed or partial rewrite must never resurrect deleted rows).
"""

from __future__ import annotations

import logging
import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

log = logging.getLogger(__name__)

PARTITION_COL = "block_bucket"

# Above this many affected partitions the per-partition copy-on-write
# planner (driver-side key list + isin pruning) is the wrong tool and
# mutations switch to one full-table rewrite. 4096 keys ≈ a few hundred
# KB on the driver and a well-sized IN-list; a daily×source layout over
# years can exceed 10^5 partitions, which must never reach either.
MAX_AFFECTED_PARTITIONS = 4096

# Hive/Spark partition-path escaping (ExternalCatalogUtils): chars that
# must be %-encoded in a "col=value" directory name.
_ESCAPE = set('"#%\'*/:=?\\{}[]^') | {chr(c) for c in range(0x20)} | {
    chr(0x7F)}
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _escape_partition_value(value) -> str:
    if value is None:
        return _HIVE_NULL
    s = str(value)
    return "".join(f"%{ord(ch):02X}" if ch in _ESCAPE else ch for ch in s)


def _partition_dir(path: str, part_col: str, value) -> str:
    return os.path.join(path, f"{part_col}={_escape_partition_value(value)}")


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


def _remove_emptied_partitions(path: str, parts: list, survivors: set,
                               part_col: str) -> list:
    """Drop the directories of affected partitions with ZERO surviving
    rows. Dynamic partition overwrite never touches a partition absent
    from the written frame, so without this step a fully-deleted
    partition keeps its old files and the delete silently fails."""
    emptied = [p for p in parts if p not in survivors]
    for p in emptied:
        d = _partition_dir(path, part_col, p)
        if os.path.isdir(d):
            shutil.rmtree(d)
    return emptied


def _full_rewrite(spark: SparkSession, path: str, out: DataFrame,
                  part_col: str) -> None:
    """One full-table copy-on-write pass: write the transformed table
    to a sibling temp dir, then swap via renames. No driver-side
    partition list, no emptied-partition bookkeeping (the swap drops
    everything old); side tables (``_tombstones``) are carried across
    the swap.

    Crash safety: the original table is renamed to a ``.__old`` sibling
    BEFORE the replacement is renamed in, and only removed after the
    new table is live — a crash at any point leaves either the original
    or the replacement fully intact on disk (never neither). The swap
    itself is two renames, not atomic for a concurrent reader
    mid-listing: mutations require a quiesced table (single-writer,
    no readers during the swap window), the same contract ClickHouse
    mutations-on-parts assume."""
    tmp = path.rstrip("/") + ".__rewrite_tmp"
    old = path.rstrip("/") + ".__old"
    for leftover in (tmp, old):
        if os.path.isdir(leftover):
            shutil.rmtree(leftover)
    (out.repartition(F.col(part_col))
        .write.mode("overwrite").partitionBy(part_col).parquet(tmp))
    for side in os.listdir(path):
        if side.startswith("_") and side != "_SUCCESS" \
                and os.path.isdir(os.path.join(path, side)):
            shutil.move(os.path.join(path, side), os.path.join(tmp, side))
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def delete_where(spark: SparkSession, path: str, predicate: Column,
                 part_col: str = PARTITION_COL,
                 max_partitions: int = MAX_AFFECTED_PARTITIONS) -> dict:
    """ALTER TABLE DELETE WHERE <predicate>, copy-on-write.

    Returns {"partitions_rewritten": n, "rows_deleted": n}. Partitions
    without matches keep their existing files untouched; partitions
    whose every row matches are REMOVED (see module doc). When more
    than ``max_partitions`` partitions are affected the mutation runs
    as one full-table rewrite instead (partitions_rewritten = -1
    signals the full path).

    NULL predicate results KEEP the row (ClickHouse ALTER DELETE
    semantics, and the same rule ``update_where``'s when/otherwise
    applies): only rows where the predicate is literally TRUE are
    deleted. A bare ``filter(~predicate)`` would silently drop NULL
    rows while excluding them from ``rows_deleted``."""
    keep = ~F.coalesce(predicate, F.lit(False))
    df = spark.read.parquet(path)
    parts = affected_partitions(df, predicate, part_col)
    log.info("delete_where: %d affected partition(s)", len(parts))
    if not parts:
        return {"partitions_rewritten": 0, "rows_deleted": 0}
    if len(parts) > max_partitions:
        log.warning(
            "delete_where: %d affected partitions > max_partitions=%d; "
            "switching to a full-table rewrite", len(parts), max_partitions)
        deleted = df.filter(predicate).count()
        _full_rewrite(spark, path, df.filter(keep), part_col)
        return {"partitions_rewritten": -1, "rows_deleted": deleted}
    affected = df.filter(F.col(part_col).isin(parts))
    deleted = affected.filter(predicate).count()
    remaining = affected.filter(keep)
    # surviving partition keys, computed BEFORE the overwrite replaces
    # the files this plan reads from
    survivors = {r[0] for r in
                 remaining.select(part_col).distinct().collect()}
    with _with_dynamic_overwrite(spark):
        (remaining.repartition(F.col(part_col))
         .write.mode("overwrite").partitionBy(part_col).parquet(path))
    _remove_emptied_partitions(path, parts, survivors, part_col)
    return {"partitions_rewritten": len(parts), "rows_deleted": deleted}


def update_where(spark: SparkSession, path: str, predicate: Column,
                 set_exprs: dict[str, Column],
                 part_col: str = PARTITION_COL,
                 max_partitions: int = MAX_AFFECTED_PARTITIONS) -> dict:
    """ALTER TABLE UPDATE col = expr WHERE <predicate>, copy-on-write.

    Non-matching rows in affected partitions are rewritten verbatim;
    other partitions are untouched. Updates never empty a partition
    (row counts are preserved) BECAUSE updating the partition column
    itself is refused — rows moving between partitions could empty the
    source partition (the delete_where failure mode) and is
    delete+insert territory, same as ClickHouse's restriction on
    mutating a key column. Above ``max_partitions`` affected
    partitions: one full-table rewrite (partitions_rewritten = -1)."""
    if part_col in set_exprs:
        raise ValueError(
            f"update_where cannot modify the partition column "
            f"{part_col!r}: rows would move between partitions (and "
            "could empty one). Model a partition-key change as "
            "delete_where + an insert of the transformed rows.")
    df = spark.read.parquet(path)

    def apply_set(frame: DataFrame) -> DataFrame:
        return frame.select(*[
            F.when(predicate, set_exprs[c]).otherwise(F.col(c)).alias(c)
            if c in set_exprs else F.col(c)
            for c in frame.columns
        ])

    parts = affected_partitions(df, predicate, part_col)
    log.info("update_where: %d affected partition(s)", len(parts))
    if not parts:
        return {"partitions_rewritten": 0, "rows_updated": 0}
    if len(parts) > max_partitions:
        log.warning(
            "update_where: %d affected partitions > max_partitions=%d; "
            "switching to a full-table rewrite", len(parts), max_partitions)
        updated_count = df.filter(predicate).count()
        _full_rewrite(spark, path, apply_set(df), part_col)
        return {"partitions_rewritten": -1, "rows_updated": updated_count}
    affected = df.filter(F.col(part_col).isin(parts))
    updated_count = affected.filter(predicate).count()
    with _with_dynamic_overwrite(spark):
        (apply_set(affected).repartition(F.col(part_col))
         .write.mode("overwrite").partitionBy(part_col).parquet(path))
    return {"partitions_rewritten": len(parts), "rows_updated": updated_count}


# ---------------------------------------------------------------------------
# lightweight deletes (ClickHouse DELETE FROM): tombstone mask instead
# of data rewrite

def lightweight_delete(spark: SparkSession, path: str, predicate: Column,
                       key_cols: tuple[str, ...]) -> int:
    """Append matching rows' keys to a tombstone side-table; readers
    go through read_with_tombstones(). Write cost O(matches).

    Keys already tombstoned are NOT re-appended (anti-join against the
    existing tombstone table), so repeated calls with overlapping
    predicates return the count of NEWLY deleted rows and the
    tombstone table never accumulates duplicates."""
    df = spark.read.parquet(path)
    tombs = df.filter(predicate).select(*key_cols).distinct()
    td = _tombstone_dir(path)
    if os.path.isdir(td):
        existing = spark.read.parquet(td)
        tombs = tombs.join(existing.distinct(), on=list(key_cols),
                           how="left_anti")
    n = tombs.count()
    if n:
        tombs.write.mode("append").parquet(td)
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
    tombstone table — but ONLY after re-verifying that no tombstoned
    key survives in the rewritten data. A partition whose rows were ALL
    tombstoned is removed explicitly (dynamic overwrite never touches a
    partition absent from the written frame); without both steps
    compaction would resurrect deleted rows."""
    td = _tombstone_dir(path)
    if not os.path.isdir(td):
        return {"partitions_rewritten": 0, "rows_deleted": 0}
    df = spark.read.parquet(path)
    tombs = spark.read.parquet(td).distinct()
    hit = df.join(tombs, on=list(tombs.columns), how="left_semi")
    parts = [r[0] for r in hit.select(part_col).distinct().collect()]
    log.info("compact_tombstones: %d affected partition(s)", len(parts))
    stats = {"partitions_rewritten": len(parts), "rows_deleted": 0}
    if parts:
        affected = df.filter(F.col(part_col).isin(parts))
        remaining = affected.join(tombs, on=list(tombs.columns),
                                  how="left_anti")
        stats["rows_deleted"] = affected.count() - remaining.count()
        survivors = {r[0] for r in
                     remaining.select(part_col).distinct().collect()}
        with _with_dynamic_overwrite(spark):
            (remaining.repartition(F.col(part_col))
             .write.mode("overwrite").partitionBy(part_col).parquet(path))
        _remove_emptied_partitions(path, parts, survivors, part_col)
    # verify-then-drop: the mask may only disappear once the data no
    # longer contains any tombstoned key
    leftover = 0
    if _has_data_partitions(path):
        leftover = (spark.read.parquet(path)
                    .join(tombs, on=list(tombs.columns), how="left_semi")
                    .count())
    if leftover:
        raise RuntimeError(
            f"compact_tombstones: {leftover} tombstoned row(s) still "
            f"present after rewrite of {path}; keeping the tombstone "
            "table so readers stay correct")
    shutil.rmtree(td)
    return stats


def _has_data_partitions(path: str) -> bool:
    """True if the table root still holds any data partition dir (an
    all-tombstoned table compacts to nothing readable)."""
    return any(not d.startswith("_") and not d.startswith(".")
               and os.path.isdir(os.path.join(path, d))
               for d in os.listdir(path))


def _tombstone_dir(path: str) -> str:
    return os.path.join(path, "_tombstones")
