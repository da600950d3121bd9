"""Edge-case robustness: empty inputs, all-retracted groups, and
degenerate documents must not break any operator family."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_aggregation_spark.operators.dedup import (
    doc_shingle_sets, shingles_col,
)
from clickhouse_aggregation_spark.operators.rollups import (
    mv_recent_activity, mv_tx_size_distribution, mv_usdc_daily_block,
)
from clickhouse_aggregation_spark.schemas import DOCUMENTS, TRANSFERS
from clickhouse_aggregation_spark.sources.transfers import transfers_df
from clickhouse_aggregation_spark.streaming.maintainer import INCREMENTAL_ROLLUPS


@pytest.fixture()
def empty_transfers(spark):
    return spark.createDataFrame([], schema=TRANSFERS)


def test_rollups_on_empty_input(spark, empty_transfers):
    assert mv_usdc_daily_block(empty_transfers).count() == 0
    assert mv_tx_size_distribution(empty_transfers).count() == 0
    assert mv_recent_activity(empty_transfers).count() == 0


def test_incremental_partials_on_empty_batch(spark, empty_transfers):
    for rollup in INCREMENTAL_ROLLUPS:
        assert rollup.partial(empty_transfers).count() == 0, rollup.name


def test_fully_retracted_group_nets_to_zero(spark, sf_dir):
    t = transfers_df(spark, sf_dir)
    # retract EVERY live row (one -1 per +1) → net must be exactly zero
    flipped = t.withColumn("_sign", -F.col("_sign")) \
               .withColumn("_version", F.col("_version") + 10)
    both = t.unionByName(flipped)
    net = both.agg(F.sum(F.col("value") * F.col("_sign")).alias("v"),
                   F.sum("_sign").alias("c")).first()
    assert net["v"] == 0 and net["c"] == 0


def test_shingles_on_degenerate_documents(spark):
    docs = spark.createDataFrame(
        [(1, "", "en", "s", 0),
         (2, "one two", "en", "s", 7),          # < k words → filtered
         (3, "one two three", "en", "s", 13),   # exactly k → 1 shingle
         (4, None, "en", "s", 0)],
        schema=DOCUMENTS)
    sets = {r["doc_id"]: r["n"] for r in
            doc_shingle_sets(docs.filter(F.col("text").isNotNull())).collect()}
    assert sets == {3: 1}


def test_shingles_col_short_text_is_empty_array(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    out = df.select(shingles_col(F.col("text")).alias("sh")).first()
    assert out["sh"] == []
