"""Training-corpus export job: materialize the cleaned, split-assigned
corpus as a Hive-partitioned parquet layout plus an accounting
manifest — the write-path counterpart of the pipeline queries
(`pipeline_clean_corpus` decides WHAT survives; this job decides how it
LANDS for the training reader).

Layout: ``out_root/corpus/split=<s>/source=<src>/*.parquet``. A
training job reads one split by path (partition pruning — no filter
ever scans another split), shards by source directory, and each file
is sorted by doc_id (row-group min/max stats give id-range skipping).

Manifest: ``out_root/manifest/`` holds per-(split, source) doc/token
counts computed FROM THE WRITTEN FILES (read-back, not from the
pre-write frame), so the manifest is evidence the export is complete,
not a claim.

At scale the export is one linear pass over documents: the dup
anti-join and quality predicate fuse into the scan pipeline (same plan
as pipeline_clean_corpus), and partitionBy fans files out per
directory without an extra shuffle (sortWithinPartitions keeps the
in-file order). The reference analog is the archive stored procedure's
INSERT-SELECT choreography (archive-strategy.sql:47-72) applied to the
LLM-pipeline surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dedup import q_dedup_minhash_lsh
from ..operators.pipeline import (TRAIN_END, VAL_END, QUALITY_MIN,
                                  _hash_bucket)
from ..operators.text import q_text_quality_score
from ..sources.tables import load_table


def clean_split_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The survivor set with its split assignment: near-dups removed
    (greedy keep-lowest-id), low-quality docs dropped, split assigned
    by the reproducible hash gate."""
    docs = load_table(spark, sf_dir, "documents")
    dropped = (q_dedup_minhash_lsh(spark, sf_dir)
               .select(F.col("doc_b").alias("doc_id")).distinct())
    quality = q_text_quality_score(spark, sf_dir).select(
        "doc_id", F.col("quality_score").alias("_q"))
    split = (F.when(_hash_bucket("split:") < TRAIN_END, "train")
             .when(_hash_bucket("split:") < VAL_END, "val")
             .otherwise("test"))
    return (docs.join(dropped, "doc_id", "left_anti")
            .join(quality, "doc_id")
            .filter(F.col("_q") >= QUALITY_MIN)
            .withColumn("split", split)
            .drop("_q"))


def export_training_corpus(spark: SparkSession, sf_dir: str,
                           out_root: str) -> DataFrame:
    """Write the partitioned corpus + manifest; returns the manifest
    (split, source, n_docs, ws_tokens) as read back from disk."""
    corpus_dir = os.path.join(out_root, "corpus")
    (clean_split_corpus(spark, sf_dir)
     .sortWithinPartitions("doc_id")
     .write.mode("overwrite")
     .partitionBy("split", "source")
     .parquet(corpus_dir))

    manifest = (
        spark.read.parquet(corpus_dir)
        .groupBy("split", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum(F.size(F.split("text", " "))).cast("long")
              .alias("ws_tokens"))
    )
    manifest.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(out_root, "manifest"))
    return spark.read.parquet(os.path.join(out_root, "manifest"))


def read_split(spark: SparkSession, out_root: str, split: str) -> DataFrame:
    """A training reader's view of one split — path-scoped, so only
    that split's directories are listed (basePath keeps the partition
    columns)."""
    return (spark.read
            .option("basePath", os.path.join(out_root, "corpus"))
            .parquet(os.path.join(out_root, "corpus", f"split={split}")))
