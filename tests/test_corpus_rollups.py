"""Corpus rollup maintainers: chunked streaming replay must reproduce
the batch recompute exactly — per-source token accounting and the FULL
vocabulary frequency table — and compaction must preserve both."""

from __future__ import annotations

import os

import pytest

from clickhouse_aggregation_spark.sources.tables import load_table
from clickhouse_aggregation_spark.streaming.corpus_rollups import (
    CORPUS_ROLLUPS, run_corpus_rollup_stream,
)


@pytest.fixture(scope="module")
def chunked_docs(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus_rollups")
    ddir = os.path.join(str(root), "docs")
    docs = load_table(spark, sf_dir, "documents").orderBy("doc_id")
    pdf = docs.toPandas()
    per = len(pdf) // 4 + 1
    for i in range(4):
        chunk = pdf.iloc[i * per:(i + 1) * per]
        if len(chunk):
            spark.createDataFrame(chunk, schema=docs.schema) \
                .coalesce(1).write.mode("append").parquet(ddir)
    return str(root), ddir


@pytest.fixture(scope="module")
def store(spark, chunked_docs):
    root, ddir = chunked_docs
    store_root = os.path.join(root, "store")
    q = run_corpus_rollup_stream(spark, ddir, store_root)
    q.awaitTermination(180)
    return store_root


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.parametrize("rollup", CORPUS_ROLLUPS, ids=lambda r: r.name)
def test_streamed_rollup_equals_recompute(spark, sf_dir, store, rollup):
    docs = load_table(spark, sf_dir, "documents")
    got = _rows(rollup.read(spark, store))
    want = _rows(rollup.recompute(docs))
    assert got == want
    assert len(got) > 0


@pytest.mark.parametrize("rollup", CORPUS_ROLLUPS, ids=lambda r: r.name)
def test_compaction_preserves_state(spark, sf_dir, store, rollup):
    before = _rows(rollup.read(spark, store))
    rollup.compact(spark, store)
    assert _rows(rollup.read(spark, store)) == before
    # compacted state is a single epoch=-1 partial
    assert sorted(e.name for e in os.scandir(rollup.store(store))
                  if e.name.startswith("epoch=")) == ["epoch=-1"]
