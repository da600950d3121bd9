"""applyInPandasWithState sessionization: the streamed sessions (after
all state times out) must equal the batch window-function twin."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from clickhouse_aggregation_spark.sources.tables import load_table
from clickhouse_aggregation_spark.streaming.stateful import (
    sessionize_batch, sessionize_stream,
)


def test_stream_sessions_match_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    # truncate ts to ms so stream (ms-precision state) and batch agree.
    # ts is TIMESTAMP_NTZ (engine-wide semantic, sources/tables.py):
    # CAST(ntz AS DOUBLE) is illegal in Spark 4, so go through
    # unix_micros on an LTZ view (session tz is UTC, so the round-trip
    # is the identity) and come back to NTZ.
    ev = ev.withColumn("ts", F.expr(
        "cast(timestamp_micros(unix_micros(cast(ts as timestamp_ltz)) "
        "div 1000 * 1000) as timestamp_ntz)"))
    edir = str(tmp_path / "events")
    ev.coalesce(1).write.parquet(edir)
    # sentinel far-future event per user forces every session to close
    sentinel = ev.groupBy("user_id").agg(
        (F.max("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts")) \
        .select(F.lit(10 ** 9).alias("event_id"), "ts", "user_id",
                F.lit("sentinel").alias("event_type"),
                F.lit(0.0).alias("value"), F.lit("{}").alias("props"))
    sentinel.coalesce(1).write.mode("append").parquet(edir)

    q = (sessionize_stream(spark, edir)
         .writeStream.format("memory").queryName("sessions")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    # sentinel-only sessions (1 zero-value event) are an artifact of the
    # close-all trick — exclude them identically on both sides
    not_sentinel = ~((F.col("n_events") == 1) & (F.col("total_value") == 0.0))
    got = spark.sql("""
        SELECT user_id, session_start, session_end, n_events,
               round(total_value, 6) AS total_value
        FROM sessions""").filter(not_sentinel)

    want = sessionize_batch(ev.unionByName(sentinel)).filter(not_sentinel) \
        .select("user_id", "session_start", "session_end", "n_events",
                F.round("total_value", 6).alias("total_value"))

    got_set = {tuple(map(str, r)) for r in got.collect()}
    want_set = {tuple(map(str, r)) for r in want.collect()}
    assert got_set, "stream emitted no sessions"
    assert got_set == want_set
