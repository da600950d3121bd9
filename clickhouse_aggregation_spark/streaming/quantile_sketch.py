"""Streaming grouped quantile sketch via ``applyInPandasWithState``
(beyond-reference; the incremental form of
``operators/quantiles.py::grouped_exact_quantiles``).

The reference's quantile surface is ClickHouse's sketch family
(``quantile()``/``uniq()`` cousins — approximate, mergeable state).
This operator maintains the same kind of mergeable state per group over
an event stream: a fixed-grid histogram (bucket = floor(value * 16),
the same monotonic bucketing as the batch exact-quantile operator).
Histogram merge is exact counter addition — associative, commutative,
replay-stable — so unlike a sampling sketch the streamed estimate is
DETERMINISTIC: after any prefix of batches the state equals the
histogram of the union of those batches, and the emitted estimate
equals the batch twin run over the same rows
(tests/test_streaming_quantiles.py asserts it).

Estimate rule: quantile p ≈ lower bound of the bucket holding rank
k = ceil(n*p/100) — error bounded by bucket width (1/16 value unit),
state bounded by value range, not row count.

Scale: state is per (event_type, bucket) counters partitioned by the
grouping key; Arrow batches in/out; each micro-batch touches each key's
state once regardless of batch row count.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.quantiles import BUCKET_SCALE

PCTS = (50, 90, 99)

SKETCH_SCHEMA = T.StructType(
    [T.StructField("event_type", T.StringType()),
     T.StructField("n", T.LongType())]
    + [T.StructField(f"q_{p}", T.DoubleType()) for p in PCTS])

_STATE_SCHEMA = T.StructType([
    T.StructField("buckets", T.ArrayType(T.LongType())),
    T.StructField("counts", T.ArrayType(T.LongType())),
])


def _estimate(buckets: list[int], counts: list[int]) -> dict[str, Any]:
    n = int(sum(counts))
    cum = np.cumsum(counts)
    out: dict[str, Any] = {"n": n}
    for p in PCTS:
        k = (n * p + 99) // 100
        idx = int(np.searchsorted(cum, k))           # first cum >= k
        out[f"q_{p}"] = buckets[idx] / BUCKET_SCALE
    return out


def _update_group(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    merged: dict[int, int] = {}
    if state.exists:
        prev_buckets, prev_counts = state.get
        merged = dict(zip(prev_buckets, prev_counts))
    for pdf in pdfs:
        vals = np.floor(pdf["value"].to_numpy(dtype="float64")
                        * BUCKET_SCALE).astype("int64")
        for b, c in zip(*np.unique(vals, return_counts=True)):
            merged[int(b)] = merged.get(int(b), 0) + int(c)
    items = sorted(merged.items())
    buckets = [b for b, _ in items]
    counts = [c for _, c in items]
    state.update((buckets, counts))
    yield pd.DataFrame([{"event_type": event_type,
                         **_estimate(buckets, counts)}])


def quantile_sketch_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Per-event-type streaming quantile estimates; each micro-batch
    appends a refreshed (event_type, n, q_*) row — the row with the
    largest n per key is the current estimate."""
    from ..schemas import EVENTS
    stream = (spark.readStream.schema(EVENTS)
              .option("maxFilesPerTrigger", 1).parquet(events_dir))
    return (
        stream.groupBy("event_type")
        .applyInPandasWithState(
            _update_group,
            outputStructType=SKETCH_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def histogram_quantiles_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the same fixed-grid histogram estimate computed with
    DataFrame ops (two map-side-combinable aggregations + a window over
    histogram rows — never a per-group row sort)."""
    hist = (events
            .select("event_type",
                    F.floor(F.col("value") * BUCKET_SCALE)
                    .cast("long").alias("_b"))
            .groupBy("event_type", "_b").agg(F.count(F.lit(1)).alias("_c")))
    wb = (Window.partitionBy("event_type").orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, 0))
    wn = Window.partitionBy("event_type")
    hist = hist.select(
        "event_type", "_b",
        F.sum("_c").over(wb).alias("_cum"),
        F.coalesce(F.sum("_c").over(
            Window.partitionBy("event_type").orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, -1)), F.lit(0))
         .alias("_cum_before"),
        F.sum("_c").over(wn).alias("n"))
    pct = F.explode(F.array(*[F.lit(p) for p in PCTS])).alias("_pct")
    picked = (
        hist.select("event_type", "_b", "_cum", "_cum_before", "n", pct)
        .withColumn("_k", F.expr("(n * _pct + 99) DIV 100"))
        .filter((F.col("_cum_before") < F.col("_k"))
                & (F.col("_k") <= F.col("_cum")))
    )
    agg = [F.max("n").cast("long").alias("n")] + [
        F.max(F.when(F.col("_pct") == p, F.col("_b") / BUCKET_SCALE))
         .alias(f"q_{p}") for p in PCTS
    ]
    return picked.groupBy("event_type").agg(*agg)
