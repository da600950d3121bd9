"""Streaming MinHash-LSH near-dup detection: the union of per-epoch dup
pairs over a chunked document stream must equal the batch operator's
answer on the full corpus, and a restart must not re-emit pairs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clickhouse_aggregation_spark.operators.dedup import q_dedup_minhash_lsh
from clickhouse_aggregation_spark.sources.tables import load_table
from clickhouse_aggregation_spark.streaming.neardup import (
    read_dup_pairs, run_neardup_stream,
)


@pytest.fixture(scope="module")
def chunked_docs(spark, sf_dir, tmp_path_factory):
    """documents split into 3 files (arrival order = doc_id order)."""
    root = tmp_path_factory.mktemp("neardup")
    ddir = os.path.join(str(root), "docs")
    docs = load_table(spark, sf_dir, "documents").orderBy("doc_id")
    pdf = docs.toPandas()
    per = len(pdf) // 3 + 1
    for i in range(3):
        chunk = pdf.iloc[i * per:(i + 1) * per]
        if len(chunk):
            spark.createDataFrame(chunk, schema=docs.schema) \
                .coalesce(1).write.mode("append").parquet(ddir)
    return str(root), ddir


@pytest.fixture(scope="module")
def streamed_store(spark, chunked_docs):
    root, ddir = chunked_docs
    store = os.path.join(root, "store")
    q = run_neardup_stream(spark, ddir, store)
    q.awaitTermination(180)
    return store


def _pairset(df):
    return {(r.doc_a, r.doc_b, round(r.jaccard, 9)) for r in df.collect()}


def test_streamed_pairs_equal_batch(spark, sf_dir, streamed_store):
    got = _pairset(read_dup_pairs(spark, streamed_store))
    want = _pairset(q_dedup_minhash_lsh(spark, sf_dir))
    assert got == want
    assert len(got) > 0  # fixture corpus does contain near-dups


def test_each_pair_emitted_once(spark, streamed_store):
    pairs = spark.read.parquet(os.path.join(streamed_store, "dup_pairs"))
    dup_rows = (pairs.groupBy("doc_a", "doc_b").count()
                .filter(F.col("count") > 1).count())
    assert dup_rows == 0


def test_restart_emits_nothing_new(spark, chunked_docs, streamed_store):
    before = read_dup_pairs(spark, streamed_store).count()
    root, ddir = chunked_docs
    q = run_neardup_stream(spark, ddir, streamed_store)
    q.awaitTermination(120)
    assert read_dup_pairs(spark, streamed_store).count() == before
