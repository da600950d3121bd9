"""Decompose a streaming facade's FIRST-TOUCH cost in a fresh session
(VERDICT r8 wrong-#1: the driver pays the facade's cold path —
chunk-write + stream drive + store read — once per round, and
warm-local timings hide it entirely; bench REPEATS>=2 reports the warm
min while the driver runs REPEATS=1).

Usage: python tools/facade_cold_probe.py [SF_DIR] [KIND]
KIND in {emb_neardup, corpus_rollups, qsketch, ann_index}; default
emb_neardup. Prints one JSON line {chunk_s, drive_s, read_s, total_s}.
The probe's temp root is removed on exit and the session shuffle width
is restored even when the drive fails (ADVICE r9).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
KIND = sys.argv[2] if len(sys.argv) > 2 else "emb_neardup"

from clickhouse_aggregation_spark.session import get_spark  # noqa: E402
from clickhouse_aggregation_spark.operators import streaming_bridge as sb  # noqa: E402

spark = get_spark("facade-cold-probe")
spark.range(1000).selectExpr("sum(id)").collect()   # session warm-up

if KIND == "emb_neardup":
    from clickhouse_aggregation_spark.streaming.embedding_neardup import (
        read_dup_pairs, run_embedding_neardup_stream)
    runner, table, id_col = run_embedding_neardup_stream, "embeddings", "vec_id"
    read = lambda store: read_dup_pairs(spark, store)  # noqa: E731
elif KIND == "corpus_rollups":
    from clickhouse_aggregation_spark.streaming.corpus_rollups import (
        CORPUS_ROLLUPS, run_corpus_rollup_stream)
    runner, table, id_col = run_corpus_rollup_stream, "documents", "doc_id"
    roll = next(r for r in CORPUS_ROLLUPS if r.name == "source_tokens")
    read = lambda store: roll.read(spark, store)  # noqa: E731
elif KIND == "qsketch":
    runner, table, id_col = sb._run_qsketch, "events", "event_id"
    read = lambda store: spark.read.parquet(  # noqa: E731
        os.path.join(store, "out"))
elif KIND == "ann_index":
    from clickhouse_aggregation_spark.streaming.ann_index import (
        read_cells, run_ann_index_stream)
    runner, table, id_col = run_ann_index_stream, "embeddings", "vec_id"
    read = lambda store: read_cells(spark, store)  # noqa: E731
else:
    raise SystemExit(f"unknown kind {KIND}")

t0 = time.time()
root, ddir, n_rows = sb._chunked_table_dir(spark, SF, f"probe_{KIND}_",
                                           table, id_col)
chunk_s = time.time() - t0

import tempfile  # noqa: E402
store_root = tempfile.mkdtemp(prefix=f"probe_{KIND}_store_")
store = os.path.join(store_root, "store")
# the SHIPPED drive width, including the stateful key-cardinality cap
# (ADVICE r10: the probe drove qsketch at the rows-derived width while
# production additionally bounds applyInPandasWithState drives by the
# grouping-key cardinality — probe and production must measure the
# same configuration). Both widths are reported.
rows_width = sb.stream_shuffle_width(spark, n_rows)
width = rows_width
if KIND == "qsketch":
    n_keys = sb.distinct_key_count(ddir, "event_type")
    width = max(sb.STREAM_MIN_PARTITIONS, min(width, n_keys))
prev = spark.conf.get("spark.sql.shuffle.partitions")
spark.conf.set("spark.sql.shuffle.partitions", str(width))
t0 = time.time()
try:
    q = runner(spark, ddir, store)
    q.awaitTermination(600)
    drive_s = time.time() - t0
finally:
    spark.conf.set("spark.sql.shuffle.partitions", prev)

t0 = time.time()
try:
    n = read(store).count()
    read_s = time.time() - t0
finally:
    shutil.rmtree(store_root, ignore_errors=True)
    # drop the chunk dir too: it went into the session-shared cache,
    # and this probe process owns the whole session
    sb._CHUNK_CACHE.pop(
        sb.chunk_cache_key(spark, table, id_col, SF), None)
    shutil.rmtree(root, ignore_errors=True)

print(json.dumps({"sf_dir": SF, "kind": KIND,
                  "width": width, "rows_width": rows_width,
                  "chunk_s": round(chunk_s, 3),
                  "drive_s": round(drive_s, 3),
                  "read_s": round(read_s, 3),
                  "total_s": round(chunk_s + drive_s + read_s, 3),
                  "rows": n}))
