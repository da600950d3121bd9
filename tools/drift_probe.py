"""Isolated-vs-in-suite drift probe (round-4 VERDICT item #4).

The shared-96 bench total has drifted upward as the resident query
count grew (96 -> 113 -> 126 plans + session caches in one process).
This probe times a handful of drifting queries in a FRESH session with
NOTHING else resident: if the isolated time matches the query's OLD
in-suite number, the drift is session pressure (cache memory / codegen
cache / scheduler state), not plan regressions.

Usage: python tools/drift_probe.py [sf_dir] [q1,q2,...]
Prints one JSON line {query: {"first": s, "warm": s}}.
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = (sys.argv[1] if len(sys.argv) > 1
      else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
NAMES = (sys.argv[2].split(",") if len(sys.argv) > 2 else
         ["transfers_pagerank3", "dedup_simhash_hamming",
          "contamination_ngram_overlap", "product_profit_by_nation_year",
          "similarity_ivf_kmeans_refine", "events_sequence_match"])

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "16g")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())

qs = dict(entrymod.queries())
qs.update(entrymod.extra_queries())
out = {}
for name in NAMES:
    fn = qs[name]
    t0 = time.monotonic()
    fn(spark, SF).collect()
    first = time.monotonic() - t0
    warm = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        fn(spark, SF).collect()
        warm = min(warm, time.monotonic() - t0)
    out[name] = {"first": round(first, 3), "warm": round(warm, 3)}
print(json.dumps(out))
