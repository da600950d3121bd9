"""Entity/serving-layer query surface (SURVEY.md §2.1 S10) and the
tumbling-window aggregation (§2.9 O6).

The reference serves a GraphQL API over the primary store —
by-id gets, indexed field filters, pagination (usdc-transfers/
schema.graphql:1-8, commands.json:58-68, indexes in db/migrations/
1691424065505-Data.js:6-8). The equivalent capability here is plain
DataFrame filtering; at scale the by-id/by-address paths ride on
partition pruning + parquet column stats instead of B-tree indexes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import load_table
from ..sources.transfers import transfers_df
from .registry import register
from .rollups import oracle


@register(
    "entity_by_id",
    oracle=oracle("""
SELECT log_id, block_number, block_timestamp, log_index, transaction_hash,
       from_address, to_address, value, _sign, _version
FROM transfers
WHERE log_id = (SELECT min(log_id) FROM transfers)"""),
    doc="GraphQL by-id get (S10): point lookup on the primary key. "
        "At scale: block prefix of the log_id prunes to one partition, "
        "parquet min/max stats skip row groups within it.",
)
def q_entity_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transfers_df(spark, sf_dir)
    target = t.agg(F.min("log_id").alias("_target"))
    return t.join(F.broadcast(target), t.log_id == F.col("_target")) \
            .drop("_target")


@register(
    "entity_filter_paginated",
    oracle=oracle("""
, target AS (SELECT min(from_address) AS addr FROM transfers)
SELECT log_id, block_number, from_address, to_address, value
FROM transfers, target
WHERE from_address = target.addr AND _sign = 1
ORDER BY block_number, log_index, _version
LIMIT 5 OFFSET 5"""),
    doc="GraphQL indexed-field filter + pagination (S10): equality on "
        "an indexed column, deterministic order, limit/offset. The "
        "index is replaced by predicate pushdown to parquet stats.",
)
def q_entity_filter_paginated(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transfers_df(spark, sf_dir)
    target = t.agg(F.min("from_address").alias("_addr"))
    return (
        t.join(F.broadcast(target), t.from_address == F.col("_addr"))
        .filter(F.col("_sign") == 1)
        .orderBy("block_number", "log_index", "_version")
        .offset(5).limit(5)
        .select("log_id", "block_number", "from_address", "to_address", "value")
    )


@register(
    "events_hourly_window",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       sum(CAST(value AS DECIMAL(18,2))) AS total_value
FROM events
GROUP BY 1, 2""",
    doc="Tumbling 1-hour window aggregation via F.window (O6) — the "
        "batch twin of the streaming windowed aggregate; window.start "
        "equals date_trunc('hour') for tumbling windows.",
)
def q_events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "total_value")
    )


@register(
    "events_value_quantiles",
    oracle=None,   # percentile_approx is sketch-based (KLL/GK): like
                   # ClickHouse quantile(), estimates are engine-specific
    doc="Approximate quantiles of event values per type "
        "(percentile_approx — the approx-sketch family alongside "
        "approx_count_distinct; A3's cousin)",
    tags=("approx",),
)
def q_events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # one sketch pass computes all three ranks; project SCALAR columns —
    # the driver's canonicalizer cannot hash array cells
    return (
        ev.groupBy("event_type")
        .agg(F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000)
              .alias("_q"),
             F.count(F.lit(1)).alias("n"))
        .select("event_type",
                F.element_at("_q", 1).alias("p50"),
                F.element_at("_q", 2).alias("p90"),
                F.element_at("_q", 3).alias("p99"),
                "n")
    )
