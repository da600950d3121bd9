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
