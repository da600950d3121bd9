"""Streaming contamination monitoring: the union of per-epoch flags
over a chunked document stream must equal the batch operator on the
full corpus, and each flagged pair must be emitted exactly once."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clickhouse_aggregation_spark.operators.contamination import (
    q_contamination_ngram_overlap,
)
from clickhouse_aggregation_spark.sources.tables import load_table
from clickhouse_aggregation_spark.streaming.contamination import (
    FLAGS_DIR, read_flags, run_contamination_stream,
)


@pytest.fixture(scope="module")
def chunked_docs(spark, sf_dir, tmp_path_factory):
    """documents split into 3 files; split by doc_id RANGE so train and
    eval members of a contaminated pair can land in different epochs
    (the cross-epoch join path gets exercised both directions)."""
    root = tmp_path_factory.mktemp("contam")
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
    q = run_contamination_stream(spark, ddir, store)
    q.awaitTermination(180)
    return store


def _flagset(df):
    return {(r.train_doc, r.eval_doc, r.common_shingles, r.n_eval_shingles,
             round(r.overlap, 9)) for r in df.collect()}


def test_streamed_flags_equal_batch(spark, sf_dir, streamed_store):
    got = _flagset(read_flags(spark, streamed_store))
    want = _flagset(q_contamination_ngram_overlap(spark, sf_dir)
                    .drop("train_source"))
    assert got == want
    assert len(got) > 0  # fixture corpus does contain contaminated pairs


def test_each_flag_emitted_once(spark, streamed_store):
    flags = spark.read.parquet(os.path.join(streamed_store, FLAGS_DIR))
    dup_rows = (flags.groupBy("train_doc", "eval_doc").count()
                .filter(F.col("count") > 1).count())
    assert dup_rows == 0
