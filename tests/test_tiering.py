"""Physical-design tests: partition pruning must actually prune (input
file counts + PartitionFilters in the plan), the archive job must move
exactly the old rows, and the union view must reproduce the full table."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clickhouse_aggregation_spark.plans.tiering import (
    archive_old_transfers, transfers_complete_view, write_partitioned,
)
from clickhouse_aggregation_spark.sources.transfers import transfers_df


@pytest.fixture(scope="module")
def partitioned_transfers(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("tiers")
    hot = os.path.join(str(root), "hot")
    t = transfers_df(spark, sf_dir)
    write_partitioned(t, hot, granularity=10_000)   # small buckets for test
    return str(root), hot, t


def _scan_num_files(df) -> int:
    """numFiles metric of the (single) parquet scan after execution."""
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    scan = leaves.head()
    return int(scan.metrics().apply("numFiles").value())


def test_partition_pruning_reduces_files_read(spark, partitioned_transfers):
    root, hot, t = partitioned_transfers
    df = spark.read.parquet(hot)
    n_all = _scan_num_files(df)
    lo = t.agg(F.min("block_number")).first()[0]
    pruned = df.filter(F.col("block_bucket") == lo // 10_000)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert f"(block_bucket#" in plan and "PartitionFilters: [" in plan
    n_pruned = _scan_num_files(pruned)
    assert 0 < n_pruned < n_all


def test_sorted_layout_and_roundtrip(spark, partitioned_transfers):
    root, hot, t = partitioned_transfers
    back = spark.read.parquet(hot).drop("block_bucket")
    assert back.count() == t.count()
    # same multiset of rows
    assert back.exceptAll(t).count() == 0 and t.exceptAll(back).count() == 0


def test_archive_job_moves_old_rows(spark, partitioned_transfers):
    root, hot, t = partitioned_transfers
    archive = os.path.join(root, "archive")
    keep = 50_000   # keep newest 50k blocks hot
    max_block = t.agg(F.max("block_number")).first()[0]
    threshold = max_block - keep
    want_archived = t.filter(F.col("block_number") < threshold).count()

    got = archive_old_transfers(spark, hot, archive, keep_blocks=keep, granularity=10_000)
    assert got == want_archived

    hot_df = spark.read.parquet(hot)
    assert hot_df.filter(F.col("block_number") < threshold).count() == 0
    if want_archived:
        arch_df = spark.read.parquet(archive)
        assert arch_df.count() == want_archived
        assert arch_df.filter(F.col("block_number") >= threshold).count() == 0

    # idempotent: second run moves nothing
    assert archive_old_transfers(spark, hot, archive, keep_blocks=keep, granularity=10_000) == 0


def test_union_view_reproduces_full_table(spark, partitioned_transfers):
    root, hot, t = partitioned_transfers
    archive = os.path.join(root, "archive")
    complete = transfers_complete_view(spark, hot, archive)
    assert complete.count() == t.count()
    total_want = t.agg(F.sum(F.col("value") * F.col("_sign"))).first()[0]
    total_got = complete.agg(F.sum(F.col("value") * F.col("_sign"))).first()[0]
    assert total_got == total_want
