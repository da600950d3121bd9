"""Streaming sign-LSH embedding near-dup: the union of per-epoch dup
pairs over a chunked vector stream must equal the batch operator's
answer on the full corpus, and a restart must not re-emit pairs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clickhouse_aggregation_spark.operators.dedup import embedding_lsh_pairs
from clickhouse_aggregation_spark.sources.tables import load_table
from clickhouse_aggregation_spark.streaming.embedding_neardup import (
    read_dup_pairs, run_embedding_neardup_stream,
)


@pytest.fixture(scope="module")
def planted_corpus(spark, sf_dir):
    """embeddings + planted exact copies of 4 vectors under new ids —
    guarantees cross-chunk near-dup pairs at the smoke scale (the raw
    sf0.001 corpus has none above the 0.45 in-bucket threshold)."""
    emb = load_table(spark, sf_dir, "embeddings")
    copies = (emb.filter(F.col("vec_id") < 4)
              .select((F.col("vec_id") + 100000).alias("vec_id"),
                      "embedding", "label"))
    return emb.unionByName(copies)


@pytest.fixture(scope="module")
def chunked_vecs(spark, planted_corpus, tmp_path_factory):
    """planted corpus split into 3 files; the planted copies land in a
    DIFFERENT chunk than their originals (vec_id % 3 shifts by 100000
    % 3 = 2), so the cross-epoch index join is what must find them."""
    root = tmp_path_factory.mktemp("emb_neardup")
    vdir = os.path.join(str(root), "vecs")
    for i in range(3):
        (planted_corpus.filter(F.col("vec_id") % 3 == i)
            .coalesce(1).write.mode("append").parquet(vdir))
    return str(root), vdir


@pytest.fixture(scope="module")
def streamed_store(spark, chunked_vecs):
    root, vdir = chunked_vecs
    store = os.path.join(root, "store")
    q = run_embedding_neardup_stream(spark, vdir, store)
    q.awaitTermination(180)
    return store


def _pairset(df):
    return {(r.vec_a, r.vec_b, round(r.cosine, 9)) for r in df.collect()}


def test_streamed_pairs_equal_batch(spark, planted_corpus, streamed_store):
    got = _pairset(read_dup_pairs(spark, streamed_store))
    want = _pairset(embedding_lsh_pairs(planted_corpus))
    assert got == want
    assert len(got) >= 4  # the planted copies are exact dups (cos = 1)


def test_each_pair_emitted_once(spark, streamed_store):
    pairs = spark.read.parquet(os.path.join(streamed_store, "dup_pairs"))
    dup_rows = (pairs.groupBy("vec_a", "vec_b").count()
                .filter(F.col("count") > 1).count())
    assert dup_rows == 0


def test_restart_emits_nothing_new(spark, chunked_vecs, streamed_store):
    before = read_dup_pairs(spark, streamed_store).count()
    root, vdir = chunked_vecs
    q = run_embedding_neardup_stream(spark, vdir, streamed_store)
    q.awaitTermination(120)
    assert read_dup_pairs(spark, streamed_store).count() == before
