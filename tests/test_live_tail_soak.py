"""Live-tail soak for the streaming maintainers (VERDICT r4 #6).

The availableNow façades are hash-checked, but the LIVE-TAILING path
(``available_now=False``, files arriving while the query runs — the
case the r3 centroid bug lived in) previously had only the
refuse-loudly guard test. These tests drive the neardup and ann-index
maintainers with shards landing MID-STREAM — written between
``processAllAvailable()`` barriers, which is exactly what a writer
thread interleaves to, minus the race-dependent flakiness — and assert
the final store equals the batch answer over everything that arrived.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clickhouse_aggregation_spark.sources.tables import load_table


def _write_shard(df, path):
    df.coalesce(1).write.mode("append").parquet(path)


@pytest.mark.slow
def test_neardup_live_tail_equals_batch(spark, sf_dir, tmp_path):
    """Docs arrive in 4 waves while the stream is RUNNING; pairs must
    match the batch operator over the full corpus, each pair once."""
    from clickhouse_aggregation_spark.operators.dedup import (
        q_dedup_minhash_lsh)
    from clickhouse_aggregation_spark.streaming.neardup import (
        read_dup_pairs, run_neardup_stream)

    ddir = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    docs = load_table(spark, sf_dir, "documents")
    waves = [docs.filter(F.col("doc_id") % 4 == i) for i in range(4)]

    _write_shard(waves[0], ddir)            # seed: one shard pre-start
    q = run_neardup_stream(spark, ddir, store, available_now=False)
    try:
        q.processAllAvailable()
        for w in waves[1:]:                 # land mid-stream
            _write_shard(w, ddir)
            q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.doc_a, r.doc_b, round(r.jaccard, 9))
           for r in read_dup_pairs(spark, store).collect()}
    want = {(r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in q_dedup_minhash_lsh(spark, sf_dir).collect()}
    assert got == want
    assert len(got) > 0
    # exactly-once: no pair in more than one epoch
    pairs = spark.read.parquet(os.path.join(store, "dup_pairs"))
    assert pairs.groupBy("doc_a", "doc_b").count() \
                .filter(F.col("count") > 1).count() == 0


@pytest.mark.slow
def test_ann_index_live_tail_equals_batch(spark, sf_dir, tmp_path):
    """Vectors arrive in waves mid-stream; the quantizer must stay
    frozen at stream start and every late vector must still land in
    the same cell the batch build assigns."""
    from clickhouse_aggregation_spark.operators.similarity import (
        N_CENTROIDS, _ivf_parts)
    from clickhouse_aggregation_spark.streaming.ann_index import (
        read_cells, run_ann_index_stream)

    vdir = str(tmp_path / "vecs")
    store = str(tmp_path / "store")
    emb = load_table(spark, sf_dir, "embeddings")
    # seed shard must contain the full quantizer (vec_id < N_CENTROIDS)
    # — the partial-quantizer refuse path has its own test
    _write_shard(emb.filter(F.col("vec_id") < N_CENTROIDS), vdir)
    waves = [emb.filter((F.col("vec_id") >= N_CENTROIDS)
                        & (F.col("vec_id") % 3 == i)) for i in range(3)]

    q = run_ann_index_stream(spark, vdir, store, available_now=False)
    try:
        q.processAllAvailable()
        for w in waves:
            _write_shard(w, vdir)
            q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.vec_id, r.centroid_id)
           for r in read_cells(spark, store)
           .select("vec_id", "centroid_id").collect()}
    corpus_cells, _ = _ivf_parts(spark, sf_dir)
    want = {(r.vec_id, r.centroid_id)
            for r in corpus_cells.select("vec_id", "centroid_id").collect()}
    assert got == want
    assert len(got) > 0


@pytest.mark.slow
def test_contamination_live_tail_equals_batch(spark, sf_dir, tmp_path):
    """Docs (train + eval holdout) arrive in 4 waves while the monitor
    is running; flags must match the batch operator, each pair once."""
    from clickhouse_aggregation_spark.operators.contamination import (
        q_contamination_ngram_overlap)
    from clickhouse_aggregation_spark.streaming.contamination import (
        read_flags, run_contamination_stream)

    ddir = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    docs = load_table(spark, sf_dir, "documents")
    waves = [docs.filter(F.col("doc_id") % 4 == i) for i in range(4)]

    _write_shard(waves[0], ddir)
    q = run_contamination_stream(spark, ddir, store, available_now=False)
    try:
        q.processAllAvailable()
        for w in waves[1:]:
            _write_shard(w, ddir)
            q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.train_doc, r.eval_doc, r.common_shingles)
           for r in read_flags(spark, store).collect()}
    want = {(r.train_doc, r.eval_doc, r.common_shingles)
            for r in q_contamination_ngram_overlap(spark, sf_dir)
            .collect()}
    assert got == want
    assert len(got) > 0
    # exactly-once: no flagged pair in more than one epoch
    import os as _os
    from clickhouse_aggregation_spark.streaming.contamination import (
        FLAGS_DIR)
    flags = spark.read.parquet(_os.path.join(store, FLAGS_DIR))
    assert flags.groupBy("train_doc", "eval_doc").count() \
                .filter(F.col("count") > 1).count() == 0


@pytest.mark.slow
def test_corpus_rollups_live_tail_equals_recompute(spark, sf_dir,
                                                   tmp_path):
    """The IncrementalRollup store machinery (shared by the MV, corpus,
    and embedding-matrix maintainers) under live tailing: shards land
    mid-stream, and every rollup's merged read must equal the batch
    recompute over everything that arrived — additive AND
    mergeable-not-additive (min/max) merge paths both exercised."""
    from clickhouse_aggregation_spark.streaming.corpus_rollups import (
        CORPUS_ROLLUPS, run_corpus_rollup_stream)

    ddir = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    docs = load_table(spark, sf_dir, "documents")
    waves = [docs.filter(F.col("doc_id") % 4 == i) for i in range(4)]

    _write_shard(waves[0], ddir)
    q = run_corpus_rollup_stream(spark, ddir, store, available_now=False)
    try:
        q.processAllAvailable()
        for w in waves[1:]:
            _write_shard(w, ddir)
            q.processAllAvailable()
    finally:
        q.stop()

    for rollup in CORPUS_ROLLUPS:
        got = {tuple(r) for r in rollup.read(spark, store).collect()}
        want = {tuple(r) for r in rollup.recompute(docs).collect()}
        assert got == want, rollup.name
        assert len(got) > 0, rollup.name


@pytest.mark.slow
def test_quantile_sketch_live_tail_equals_batch(spark, sf_dir, tmp_path):
    """The stateful sketch (applyInPandasWithState) under live tailing:
    event shards land in 3 waves while the query runs; the final
    per-key estimate must equal the batch twin over everything that
    arrived (counter merge is exact addition, so equality is exact)."""
    from clickhouse_aggregation_spark.streaming.quantile_sketch import (
        PCTS, histogram_quantiles_batch, quantile_sketch_stream)

    edir = str(tmp_path / "events")
    out = str(tmp_path / "out")
    events = load_table(spark, sf_dir, "events")
    waves = [events.filter(F.col("event_id") % 3 == i) for i in range(3)]

    _write_shard(waves[0], edir)
    q = (quantile_sketch_stream(spark, edir).writeStream
         .format("parquet").option("path", out)
         .option("checkpointLocation", str(tmp_path / "_ckpt"))
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        for w in waves[1:]:
            _write_shard(w, edir)
            q.processAllAvailable()
    finally:
        q.stop()

    est = spark.read.parquet(out)
    latest = est.groupBy("event_type").agg(F.max("n").alias("n"))
    final = {r.event_type: (r.n, *[getattr(r, f"q_{p}") for p in PCTS])
             for r in est.join(latest, ["event_type", "n"]).collect()}
    batch = {r.event_type: (r.n, *[getattr(r, f"q_{p}") for p in PCTS])
             for r in histogram_quantiles_batch(events).collect()}
    assert final == batch
    assert len(final) > 0


@pytest.mark.slow
def test_embedding_neardup_live_tail_equals_batch(spark, sf_dir,
                                                  tmp_path):
    """Vectors arrive in 3 waves mid-stream; the dup-pair store must
    equal the batch sign-LSH operator over the full table, each
    unordered pair exactly once."""
    from clickhouse_aggregation_spark.operators.dedup import (
        q_dedup_embedding_lsh)
    from clickhouse_aggregation_spark.streaming.embedding_neardup import (
        read_dup_pairs, run_embedding_neardup_stream)

    vdir = str(tmp_path / "vecs")
    store = str(tmp_path / "store")
    emb = load_table(spark, sf_dir, "embeddings")
    waves = [emb.filter(F.col("vec_id") % 3 == i) for i in range(3)]

    _write_shard(waves[0], vdir)
    q = run_embedding_neardup_stream(spark, vdir, store,
                                     available_now=False)
    try:
        q.processAllAvailable()
        for w in waves[1:]:
            _write_shard(w, vdir)
            q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.vec_a, r.vec_b, round(r.cosine, 9))
           for r in read_dup_pairs(spark, store).collect()}
    want = {(r.vec_a, r.vec_b, round(r.cosine, 9))
            for r in q_dedup_embedding_lsh(spark, sf_dir).collect()}
    assert got == want
    pairs = spark.read.parquet(os.path.join(store, "dup_pairs"))
    assert pairs.groupBy("vec_a", "vec_b").count() \
                .filter(F.col("count") > 1).count() == 0
