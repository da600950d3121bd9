"""Streaming IVF index maintainer: the union of per-epoch cell
assignments over a chunked vector stream must equal the batch index
build on the full corpus, a restart must not duplicate or change
assignments, and epoch replays must be idempotent."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clickhouse_aggregation_spark.operators.similarity import _ivf_parts
from clickhouse_aggregation_spark.streaming.ann_index import (
    read_cells, run_ann_index_stream,
)


@pytest.fixture(scope="module")
def chunked_vecs(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("ann_index")
    vdir = os.path.join(str(root), "vecs")
    from clickhouse_aggregation_spark.sources.tables import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    for i in range(3):
        (emb.filter(F.col("vec_id") % 3 == i)
            .coalesce(1).write.mode("append").parquet(vdir))
    return str(root), vdir


@pytest.fixture(scope="module")
def streamed_store(spark, chunked_vecs):
    root, vdir = chunked_vecs
    store = os.path.join(root, "store")
    q = run_ann_index_stream(spark, vdir, store)
    q.awaitTermination(180)
    return store


def _assignments(df):
    return {(r.vec_id, r.centroid_id) for r in
            df.select("vec_id", "centroid_id").collect()}


def test_streamed_index_equals_batch_build(spark, sf_dir, streamed_store):
    got = _assignments(read_cells(spark, streamed_store))
    corpus_cells, _ = _ivf_parts(spark, sf_dir)
    want = _assignments(corpus_cells)
    assert got == want
    assert len(got) > 0


def test_store_has_one_row_per_vector(spark, streamed_store):
    cells = read_cells(spark, streamed_store)
    assert cells.count() == cells.select("vec_id").distinct().count()


def test_partial_quantizer_refuses_to_start(spark, sf_dir, tmp_path):
    """The coarse quantizer is index CONFIGURATION, loaded once at
    stream start: if the source directory holds fewer than N_CENTROIDS
    centroid vectors (live tailing started before the quantizer fully
    arrived), the maintainer must refuse rather than permanently
    mis-assign early epochs against a partial centroid set (ADVICE r3,
    medium)."""
    from clickhouse_aggregation_spark.operators.similarity import N_CENTROIDS
    from clickhouse_aggregation_spark.sources.tables import load_table
    from clickhouse_aggregation_spark.streaming.ann_index import (
        load_centroids_once,
    )
    vdir = str(tmp_path / "partial_vecs")
    emb = load_table(spark, sf_dir, "embeddings")
    # only half the quantizer's vectors have arrived
    emb.filter(F.col("vec_id") >= N_CENTROIDS // 2) \
       .coalesce(1).write.parquet(vdir)
    with pytest.raises(RuntimeError, match="quantizer incomplete"):
        load_centroids_once(spark, vdir)
    with pytest.raises(RuntimeError, match="quantizer incomplete"):
        run_ann_index_stream(spark, vdir, str(tmp_path / "store"))


def test_centroids_frozen_at_stream_start(spark, chunked_vecs):
    """load_centroids_once returns a LOCAL frozen copy: rows collected
    once, count-asserted, independent of later source-dir growth."""
    from clickhouse_aggregation_spark.operators.similarity import N_CENTROIDS
    from clickhouse_aggregation_spark.streaming.ann_index import (
        _centroids, load_centroids_once,
    )
    _, vdir = chunked_vecs
    frozen = load_centroids_once(spark, vdir)
    assert frozen.count() == N_CENTROIDS
    live = _centroids(spark, vdir)
    got = {(r[0], tuple(r[1]), r[2]) for r in frozen.collect()}
    want = {(r[0], tuple(r[1]), r[2]) for r in live.collect()}
    assert got == want


def test_restart_is_idempotent(spark, chunked_vecs, streamed_store):
    """Re-running against the same checkpoint finds no new files and
    must leave the store byte-for-byte equivalent (same assignments,
    same row count)."""
    root, vdir = chunked_vecs
    before = _assignments(read_cells(spark, streamed_store))
    n_before = read_cells(spark, streamed_store).count()
    q = run_ann_index_stream(spark, vdir, streamed_store)
    q.awaitTermination(120)
    after_df = read_cells(spark, streamed_store)
    assert _assignments(after_df) == before
    assert after_df.count() == n_before
