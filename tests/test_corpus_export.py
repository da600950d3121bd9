"""Corpus export job: the written layout must be complete (manifest
read back from disk equals the pre-write accounting and the declared
clean-corpus query), split reads must touch only their partition
directories, and re-export must be idempotent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_aggregation_spark.operators.pipeline import (
    q_pipeline_clean_corpus,
)
from clickhouse_aggregation_spark.plans.corpus_export import (
    clean_split_corpus, export_training_corpus, read_split,
)


@pytest.fixture(scope="module")
def exported(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("export"))
    manifest = export_training_corpus(spark, sf_dir, out)
    return out, manifest


def test_manifest_matches_prewrite_accounting(spark, sf_dir, exported):
    _, manifest = exported
    got = {(r.split, r.source): (r.n_docs, r.ws_tokens)
           for r in manifest.collect()}
    want = {
        (r.split, r.source): (r.n_docs, r.ws_tokens)
        for r in clean_split_corpus(spark, sf_dir)
        .groupBy("split", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum(F.size(F.split("text", " "))).cast("long")
              .alias("ws_tokens"))
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_export_agrees_with_declared_clean_corpus(spark, sf_dir, exported):
    """Total survivors per source must equal the driver-checked
    pipeline_clean_corpus accounting (n_kept)."""
    _, manifest = exported
    got = {r.source: r.n_docs for r in
           manifest.groupBy("source")
           .agg(F.sum("n_docs").alias("n_docs")).collect()}
    want = {r.source: r.n_kept
            for r in q_pipeline_clean_corpus(spark, sf_dir).collect()}
    assert got == want


def test_split_read_prunes_to_its_directories(spark, exported):
    out, _ = exported
    train = read_split(spark, out, "train")
    files = train.inputFiles()
    assert files and all("split=train" in f for f in files)
    assert set(train.select("split").distinct().toPandas()["split"]) \
        == {"train"}


def test_reexport_is_idempotent(spark, sf_dir, exported):
    out, manifest = exported
    before = {(r.split, r.source): (r.n_docs, r.ws_tokens)
              for r in manifest.collect()}
    again = export_training_corpus(spark, sf_dir, out)
    after = {(r.split, r.source): (r.n_docs, r.ws_tokens)
             for r in again.collect()}
    assert before == after
