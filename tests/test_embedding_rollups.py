"""Embedding matrix rollup maintainers: chunked streaming replay must
reproduce the batch Gram matrix / per-dimension marginals exactly
(integer state, so exact equality), and compaction must preserve both —
including the mergeable-not-additive min/max columns."""

from __future__ import annotations

import os

import pytest

from clickhouse_aggregation_spark.sources.tables import load_table
from clickhouse_aggregation_spark.streaming.embedding_rollups import (
    EMBEDDING_ROLLUPS, run_embedding_rollup_stream,
)


@pytest.fixture(scope="module")
def chunked_embs(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("embedding_rollups")
    edir = os.path.join(str(root), "embs")
    embs = load_table(spark, sf_dir, "embeddings")
    for i in range(4):
        (embs.filter(embs.vec_id % 4 == i)
             .coalesce(1).write.mode("append").parquet(edir))
    return str(root), edir


@pytest.fixture(scope="module")
def store(spark, chunked_embs):
    root, edir = chunked_embs
    store_root = os.path.join(root, "store")
    q = run_embedding_rollup_stream(spark, edir, store_root)
    q.awaitTermination(180)
    return store_root


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.parametrize("rollup", EMBEDDING_ROLLUPS, ids=lambda r: r.name)
def test_streamed_rollup_equals_recompute(spark, sf_dir, store, rollup):
    embs = load_table(spark, sf_dir, "embeddings")
    got = _rows(rollup.read(spark, store))
    want = _rows(rollup.recompute(embs))
    assert got == want
    assert len(got) > 0


@pytest.mark.parametrize("rollup", EMBEDDING_ROLLUPS, ids=lambda r: r.name)
def test_compaction_preserves_state(spark, sf_dir, store, rollup):
    before = _rows(rollup.read(spark, store))
    rollup.compact(spark, store)
    assert _rows(rollup.read(spark, store)) == before
    assert sorted(e.name for e in os.scandir(rollup.store(store))
                  if e.name.startswith("epoch=")) == ["epoch=-1"]


def test_gram_state_size_is_corpus_independent(spark, store):
    """The maintained state is one row per matrix cell: 2 080 for the
    dim-64 upper triangle and 64 marginals — the property that makes
    the rollup free at any corpus size."""
    gram = next(r for r in EMBEDDING_ROLLUPS if r.name == "gram")
    dims = next(r for r in EMBEDDING_ROLLUPS if r.name == "dim_stats")
    assert gram.read(spark, store).count() == 64 * 65 // 2
    assert dims.read(spark, store).count() == 64
