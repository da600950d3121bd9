"""Custom stateful streaming operator via ``applyInPandasWithState``
(beyond-reference; the escape hatch for operators Structured
Streaming's built-ins can't express — SURVEY.md §2.9 footnote).

Implemented operator: **sessionization** — group an event stream by
user, close a session after a 30-minute silence gap, emit one row per
closed session. The reference has no sessions (its closest analogs are
the 24 h retention window and finality horizon), but any behavioral
analytics layer on this pipeline needs them, and they're the canonical
"custom state machine" shape: per-key state + event-time timeout.

Scale: state is per-user (bounded by active users within the timeout
horizon), partitioned by the grouping key across executors; Arrow
batches in/out. The batch twin (``sessionize_batch``) is the lag/cumsum
window composition — tests assert stream ≡ batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schemas import EVENTS

SESSION_GAP_MIN = 30

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start_ms", T.LongType()),
    T.StructField("end_ms", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def _sessionize_group(key: tuple[Any, ...],
                      pdfs: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-user state machine: extend the open session or close+emit."""
    gap_ms = SESSION_GAP_MIN * 60 * 1000
    (user_id,) = key
    if state.hasTimedOut:
        start_ms, end_ms, n, total = state.get
        state.remove()
        yield pd.DataFrame([{
            "user_id": user_id,
            "session_start": pd.Timestamp(start_ms, unit="ms"),
            "session_end": pd.Timestamp(end_ms, unit="ms"),
            "n_events": n, "total_value": total,
        }])
        return

    rows = pd.concat(list(pdfs)).sort_values("ts")
    ts_ms = (rows["ts"].astype("int64") // 1_000_000).tolist()
    values = rows["value"].tolist()

    closed = []
    if state.exists:
        start_ms, end_ms, n, total = state.get
    else:
        start_ms, end_ms, n, total = ts_ms[0], ts_ms[0], 0, 0.0

    for t_ms, v in zip(ts_ms, values):
        # >= not >: session_window's [start, start+gap) convention starts
        # a NEW session at a gap of exactly `gap`; all three
        # sessionization formulations in this repo share that boundary
        if t_ms - end_ms >= gap_ms and n > 0:
            closed.append((start_ms, end_ms, n, total))
            start_ms, n, total = t_ms, 0, 0.0
        end_ms = max(end_ms, t_ms)
        n += 1
        total += v

    state.update((start_ms, end_ms, n, total))
    state.setTimeoutTimestamp(end_ms + gap_ms)

    if closed:
        yield pd.DataFrame([{
            "user_id": user_id,
            "session_start": pd.Timestamp(s, unit="ms"),
            "session_end": pd.Timestamp(e, unit="ms"),
            "n_events": cn, "total_value": ct,
        } for s, e, cn, ct in closed])


def sessionize_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Streaming sessionization with event-time timeout."""
    stream = spark.readStream.schema(EVENTS).parquet(events_dir)
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame,
                     gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Batch twin: lag + cumulative-sum session ids (the standard
    window-function sessionization) — the correctness oracle for the
    streaming operator."""
    w = Window.partitionBy("user_id").orderBy("ts")

    # ts is TIMESTAMP_NTZ engine-wide (sources/tables.py); CAST(ntz AS
    # BIGINT) is illegal in Spark 4, so measure the gap in epoch micros
    # via an LTZ view (session tz is UTC, so the hop is the identity).
    def _micros(c):
        return F.unix_micros(c.cast("timestamp_ltz"))

    gap = F.coalesce(
        (_micros(F.col("ts")) - _micros(F.lag("ts").over(w)))
        >= gap_min * 60 * 1_000_000, F.lit(False))
    with_id = (
        events.withColumn("_new", gap.cast("long"))
        .withColumn("_sid", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        with_id.groupBy("user_id", "_sid")
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"),
             F.sum("value").alias("total_value"))
        .drop("_sid")
    )
