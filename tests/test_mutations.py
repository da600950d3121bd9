"""Mutation jobs (ALTER TABLE DELETE/UPDATE parity): copy-on-write
rewrites must touch ONLY affected partitions, lightweight deletes must
present the same live view, and compaction must fold tombstones away.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clickhouse_aggregation_spark.plans import mutations as M
from clickhouse_aggregation_spark.plans.tiering import write_partitioned
from clickhouse_aggregation_spark.sources.transfers import transfers_df


def _fresh_table(spark, sf_dir, tmp_path, name):
    path = str(tmp_path / name)
    write_partitioned(transfers_df(spark, sf_dir), path)
    return path


def _partition_files(path):
    """{partition_dir: {file: (size, mtime)}} for data files."""
    out = {}
    for d in os.listdir(path):
        full = os.path.join(path, d)
        if not os.path.isdir(full) or d.startswith("_"):
            continue
        out[d] = {f: (os.path.getsize(os.path.join(full, f)),
                      os.path.getmtime(os.path.join(full, f)))
                  for f in os.listdir(full) if f.endswith(".parquet")}
    return out


def _subset_victim(spark, path):
    """An address present in SOME partitions but not all, so the
    untouched-partition assertions are meaningful."""
    df = spark.read.parquet(path)
    nbuckets = df.select("block_bucket").distinct().count()
    return (df.groupBy("from_address")
            .agg(F.countDistinct("block_bucket").alias("nb"))
            .filter(F.col("nb") < nbuckets)
            .orderBy("from_address")
            .limit(1).collect())[0][0]


def test_delete_where_removes_rows_and_spares_other_partitions(
        spark, sf_dir, tmp_path):
    path = _fresh_table(spark, sf_dir, tmp_path, "del")
    victim = _subset_victim(spark, path)
    before_files = _partition_files(path)
    df = spark.read.parquet(path)
    total = df.count()
    pred = F.col("from_address") == victim
    n_victim = df.filter(pred).count()
    affected = {f"block_bucket={r[0]}" for r in
                df.filter(pred).select("block_bucket").distinct().collect()}
    assert 0 < len(affected) < len(before_files), \
        "fixture must leave some partitions untouched"

    stats = M.delete_where(spark, path, pred)
    assert stats == {"partitions_rewritten": len(affected),
                     "rows_deleted": n_victim}
    after = spark.read.parquet(path)
    assert after.count() == total - n_victim
    assert after.filter(pred).count() == 0
    after_files = _partition_files(path)
    for part, files in before_files.items():
        if part not in affected:
            assert after_files[part] == files, \
                f"untouched partition {part} was rewritten"


def test_delete_where_no_match_is_a_noop(spark, sf_dir, tmp_path):
    path = _fresh_table(spark, sf_dir, tmp_path, "noop")
    before_files = _partition_files(path)
    stats = M.delete_where(spark, path, F.col("value") < -1)
    assert stats == {"partitions_rewritten": 0, "rows_deleted": 0}
    assert _partition_files(path) == before_files


def test_update_where_transforms_only_matching_rows(
        spark, sf_dir, tmp_path):
    path = _fresh_table(spark, sf_dir, tmp_path, "upd")
    victim = _subset_victim(spark, path)
    df = spark.read.parquet(path)
    pred = F.col("from_address") == victim
    total = df.count()
    n_victim = df.filter(pred).count()
    other_sum = df.filter(~pred).agg(F.sum("value")).collect()[0][0]

    stats = M.update_where(spark, path, pred,
                           {"value": F.lit(0).cast("decimal(38,0)"),
                            "to_address": F.lit("0xREDACTED")})
    assert stats["rows_updated"] == n_victim
    after = spark.read.parquet(path)
    got = after.filter(pred).agg(
        F.sum("value"), F.countDistinct("to_address")).collect()[0]
    assert got[0] == 0 and got[1] == 1
    assert after.filter(~pred).agg(F.sum("value")).collect()[0][0] == other_sum
    assert after.count() == total


def test_delete_where_full_partition(spark, sf_dir, tmp_path):
    """Deleting EVERY row of a partition must actually remove it —
    dynamic overwrite alone leaves an emptied partition's old files in
    place (ADVICE r3, high)."""
    path = _fresh_table(spark, sf_dir, tmp_path, "delfull")
    df = spark.read.parquet(path)
    victim_bucket = df.select("block_bucket").distinct() \
                      .orderBy("block_bucket").limit(1).collect()[0][0]
    pred = F.col("block_bucket") == victim_bucket
    n_victim = df.filter(pred).count()
    total = df.count()
    assert 0 < n_victim < total

    stats = M.delete_where(spark, path, pred)
    assert stats == {"partitions_rewritten": 1, "rows_deleted": n_victim}
    assert not os.path.isdir(
        os.path.join(path, f"block_bucket={victim_bucket}"))
    after = spark.read.parquet(path)
    assert after.count() == total - n_victim
    assert after.filter(pred).count() == 0


def test_delete_where_mixed_full_and_partial_partitions(
        spark, sf_dir, tmp_path):
    """One predicate that fully empties one partition and partially
    hits another: both outcomes must be correct in the same call."""
    path = _fresh_table(spark, sf_dir, tmp_path, "delmix")
    df = spark.read.parquet(path)
    b0, b1 = [r[0] for r in df.select("block_bucket").distinct()
              .orderBy("block_bucket").limit(2).collect()]
    some_addr = (df.filter(F.col("block_bucket") == b1)
                 .select("from_address").orderBy("from_address")
                 .limit(1).collect())[0][0]
    pred = (F.col("block_bucket") == b0) | (
        (F.col("block_bucket") == b1) & (F.col("from_address") == some_addr))
    n_victim = df.filter(pred).count()
    total = df.count()

    stats = M.delete_where(spark, path, pred)
    assert stats["rows_deleted"] == n_victim
    assert not os.path.isdir(os.path.join(path, f"block_bucket={b0}"))
    assert os.path.isdir(os.path.join(path, f"block_bucket={b1}"))
    after = spark.read.parquet(path)
    assert after.count() == total - n_victim
    assert after.filter(pred).count() == 0


def test_delete_where_guard_switches_to_full_rewrite(
        spark, sf_dir, tmp_path):
    """Above max_partitions affected partitions the mutation must stop
    enumerating driver-side keys and run one full-table rewrite (same
    result, partitions_rewritten = -1 signals the path taken)."""
    path = _fresh_table(spark, sf_dir, tmp_path, "delguard")
    df = spark.read.parquet(path)
    victim = _subset_victim(spark, path)
    pred = F.col("from_address") == victim
    n_victim = df.filter(pred).count()
    total = df.count()
    n_affected = df.filter(pred).select("block_bucket").distinct().count()
    assert n_affected > 1

    stats = M.delete_where(spark, path, pred, max_partitions=1)
    assert stats == {"partitions_rewritten": -1, "rows_deleted": n_victim}
    after = spark.read.parquet(path)
    assert after.count() == total - n_victim
    assert after.filter(pred).count() == 0


def test_update_where_guard_switches_to_full_rewrite(
        spark, sf_dir, tmp_path):
    path = _fresh_table(spark, sf_dir, tmp_path, "updguard")
    df = spark.read.parquet(path)
    victim = _subset_victim(spark, path)
    pred = F.col("from_address") == victim
    total = df.count()
    n_victim = df.filter(pred).count()
    other_sum = df.filter(~pred).agg(F.sum("value")).collect()[0][0]

    stats = M.update_where(spark, path, pred,
                           {"value": F.lit(0).cast("decimal(38,0)")},
                           max_partitions=1)
    assert stats == {"partitions_rewritten": -1, "rows_updated": n_victim}
    after = spark.read.parquet(path)
    assert after.count() == total
    assert after.filter(pred).agg(F.sum("value")).collect()[0][0] == 0
    assert after.filter(~pred).agg(F.sum("value")).collect()[0][0] == other_sum


def test_compact_tombstones_full_partition_stays_deleted(
        spark, sf_dir, tmp_path):
    """Tombstoning EVERY row of a partition, then compacting, must not
    resurrect the rows (ADVICE r3, high): the emptied partition's dir
    is removed and the tombstone table only dropped after the verify
    pass confirms no tombstoned key survives."""
    path = _fresh_table(spark, sf_dir, tmp_path, "lwfull")
    keys = ("log_id", "_version", "_sign")
    df = spark.read.parquet(path)
    victim_bucket = df.select("block_bucket").distinct() \
                      .orderBy("block_bucket").limit(1).collect()[0][0]
    pred = F.col("block_bucket") == victim_bucket
    n_victim = df.filter(pred).count()
    total = df.count()

    n = M.lightweight_delete(spark, path, pred, keys)
    assert n == n_victim
    assert M.read_with_tombstones(spark, path, keys).count() \
        == total - n_victim

    stats = M.compact_tombstones(spark, path, keys)
    assert stats["rows_deleted"] == n_victim
    assert not os.path.isdir(os.path.join(path, "_tombstones"))
    assert not os.path.isdir(
        os.path.join(path, f"block_bucket={victim_bucket}"))
    after = spark.read.parquet(path)
    assert after.count() == total - n_victim
    assert after.filter(pred).count() == 0


def test_lightweight_delete_overlapping_predicates_count_once(
        spark, sf_dir, tmp_path):
    """Re-deleting already-tombstoned rows must report 0 new deletions
    and must not grow the tombstone table (ADVICE r3, low)."""
    path = _fresh_table(spark, sf_dir, tmp_path, "lwdup")
    keys = ("log_id", "_version", "_sign")
    victim = _subset_victim(spark, path)
    pred = F.col("from_address") == victim

    n1 = M.lightweight_delete(spark, path, pred, keys)
    assert n1 > 0
    tomb_rows = spark.read.parquet(
        os.path.join(path, "_tombstones")).count()
    assert tomb_rows == n1

    n2 = M.lightweight_delete(spark, path, pred, keys)
    assert n2 == 0
    assert spark.read.parquet(
        os.path.join(path, "_tombstones")).count() == n1

    live = M.read_with_tombstones(spark, path, keys)
    assert live.filter(pred).count() == 0


def test_lightweight_delete_matches_copy_on_write(spark, sf_dir, tmp_path):
    cow = _fresh_table(spark, sf_dir, tmp_path, "cow")
    lw = _fresh_table(spark, sf_dir, tmp_path, "lw")
    victim = _subset_victim(spark, cow)
    pred = F.col("from_address") == victim
    keys = ("log_id", "_version", "_sign")

    M.delete_where(spark, cow, pred)
    before_files = _partition_files(lw)
    n = M.lightweight_delete(spark, lw, pred, keys)
    assert n > 0
    # data files untouched — tombstones only
    assert _partition_files(lw) == before_files
    live = M.read_with_tombstones(spark, lw, keys)
    want = spark.read.parquet(cow)
    assert live.count() == want.count()
    assert live.filter(pred).count() == 0

    # compaction folds the mask into the files and drops it
    stats = M.compact_tombstones(spark, lw, keys)
    assert stats["rows_deleted"] == n
    assert not os.path.isdir(os.path.join(lw, "_tombstones"))
    assert spark.read.parquet(lw).count() == want.count()
    # post-compaction reads need no anti-join
    assert M.read_with_tombstones(spark, lw, keys).count() == want.count()


def test_update_where_refuses_partition_column(spark, sf_dir, tmp_path):
    """Updating the partition column would move rows across partitions
    (and could empty one — the delete_where failure mode); the mutation
    must refuse with guidance instead of corrupting the layout."""
    path = _fresh_table(spark, sf_dir, tmp_path, "updpart")
    with pytest.raises(ValueError, match="partition column"):
        M.update_where(spark, path, F.col("value") > 0,
                       {"block_bucket": F.lit(0)})


def _nullable_table(spark, tmp_path, name):
    """Tiny partitioned table with a NULLABLE value column: ClickHouse
    ALTER DELETE semantics say a NULL predicate result KEEPS the row."""
    path = str(tmp_path / name)
    rows = [(1, 10, "a"), (2, None, "b"), (3, 1, "c"),
            (4, None, "d"), (5, 7, "e")]
    df = spark.createDataFrame(rows, "id INT, v INT, tag STRING") \
        .withColumn("block_bucket", F.col("id") % 2)
    (df.repartition(F.col("block_bucket"))
       .write.mode("overwrite").partitionBy("block_bucket").parquet(path))
    return path


def test_delete_where_null_predicate_keeps_rows(spark, tmp_path):
    """ADVICE r4 (medium): filter(~predicate) silently drops NULL rows
    while excluding them from rows_deleted — NULL must mean KEEP, the
    same rule update_where's when/otherwise applies."""
    path = _nullable_table(spark, tmp_path, "nulldel")
    stats = M.delete_where(spark, path, F.col("v") > 5)
    assert stats["rows_deleted"] == 2            # v=10 and v=7 only
    after = spark.read.parquet(path)
    assert after.count() == 3
    # the NULL-v rows survived
    assert after.filter(F.col("v").isNull()).count() == 2


def test_delete_where_null_predicate_keeps_rows_full_rewrite(
        spark, tmp_path):
    """Same NULL-keep rule on the >max_partitions full-rewrite path."""
    path = _nullable_table(spark, tmp_path, "nulldelfull")
    stats = M.delete_where(spark, path, F.col("v") > 5, max_partitions=0)
    assert stats == {"partitions_rewritten": -1, "rows_deleted": 2}
    after = spark.read.parquet(path)
    assert after.count() == 3
    assert after.filter(F.col("v").isNull()).count() == 2
    # crash-safe swap leaves no residue siblings
    assert not os.path.isdir(path + ".__old")
    assert not os.path.isdir(path + ".__rewrite_tmp")
