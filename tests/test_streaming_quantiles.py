"""Streaming histogram-sketch quantiles: the final streamed estimate
per event type must equal the batch twin over the full event table
(the sketch's merge is exact counter addition, so no tolerance is
needed), and estimates must refine monotonically in n."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clickhouse_aggregation_spark.sources.tables import load_table
from clickhouse_aggregation_spark.streaming.quantile_sketch import (
    PCTS, histogram_quantiles_batch, quantile_sketch_stream,
)


@pytest.fixture(scope="module")
def chunked_events(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("qsketch")
    edir = os.path.join(str(root), "events")
    events = load_table(spark, sf_dir, "events").orderBy("event_id")
    pdf = events.toPandas()
    per = len(pdf) // 3 + 1
    for i in range(3):
        chunk = pdf.iloc[i * per:(i + 1) * per]
        if len(chunk):
            spark.createDataFrame(chunk, schema=events.schema) \
                .coalesce(1).write.mode("append").parquet(edir)
    return str(root), edir


@pytest.fixture(scope="module")
def streamed_estimates(spark, chunked_events):
    root, edir = chunked_events
    out = os.path.join(root, "out")
    q = (quantile_sketch_stream(spark, edir).writeStream
         .format("parquet").option("path", out)
         .option("checkpointLocation", os.path.join(root, "_ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.read.parquet(out)


def _final_per_key(df):
    latest = df.groupBy("event_type").agg(F.max("n").alias("n"))
    return df.join(latest, ["event_type", "n"])


def test_final_estimate_equals_batch(spark, sf_dir, streamed_estimates):
    final = {
        r.event_type: (r.n, *[getattr(r, f"q_{p}") for p in PCTS])
        for r in _final_per_key(streamed_estimates).collect()
    }
    batch = {
        r.event_type: (r.n, *[getattr(r, f"q_{p}") for p in PCTS])
        for r in histogram_quantiles_batch(
            load_table(spark, sf_dir, "events")).collect()
    }
    assert final == batch
    assert len(final) > 0


def test_estimates_refine_monotonically(streamed_estimates):
    rows = streamed_estimates.orderBy("event_type", "n").collect()
    seen: dict[str, int] = {}
    for r in rows:
        assert r.n > seen.get(r.event_type, 0)  # n strictly grows per emit
        seen[r.event_type] = r.n


def test_sketch_tracks_exact_within_bucket_width(spark, sf_dir,
                                                 streamed_estimates):
    """The histogram estimate must sit within one bucket width of the
    exact rank-rule quantile (the sketch's error bound)."""
    from clickhouse_aggregation_spark.operators.quantiles import (
        BUCKET_SCALE, grouped_exact_quantiles,
    )
    exact = {
        r.event_type: [getattr(r, f"q_{p}") for p in PCTS]
        for r in grouped_exact_quantiles(
            load_table(spark, sf_dir, "events"), "event_type", "value",
            list(PCTS)).collect()
    }
    for r in _final_per_key(streamed_estimates).collect():
        for p, ex in zip(PCTS, exact[r.event_type]):
            est = getattr(r, f"q_{p}")
            assert est <= ex < est + 1.0 / BUCKET_SCALE + 1e-9
