"""Ad-hoc analytics queries from the reference's README and
monitoring.sql (SURVEY.md §2.4 A7-A9, §2.6 T1-T2), plus the CDC
retraction-algebra queries (§2.9 O2).

These all follow the reference's read contract: SummingMergeTree merges
are lazy, so queries *re-aggregate over the rollup* (second-level GROUP
BY — reference: usdc-transfers/README.md:66-85). Here that composes the
rollup transform with another groupBy; Catalyst collapses the two
aggregations into one two-phase hash aggregate where legal.

Top-k queries add deterministic tie-breakers on both the Spark and
oracle side so the hash-compare is stable (the reference's ORDER BY
volume DESC leaves ties unspecified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.transfers import transfers_df
from .registry import register
from .rollups import (
    live, mv_top_senders, mv_tx_size_distribution, mv_usdc_daily_ts, oracle,
)


@register(
    "readme_daily_volume_7d",
    oracle=oracle("""
, rollup AS (
  SELECT CAST(block_timestamp AS DATE) AS day, from_address, to_address,
         sum(value) AS total_usdc, count(*) AS tx_count
  FROM transfers WHERE _sign = 1 GROUP BY 1, 2, 3
)
SELECT day, sum(total_usdc) AS daily_volume, CAST(sum(tx_count) AS BIGINT) AS daily_txs
FROM rollup GROUP BY day ORDER BY day DESC LIMIT 7"""),
    doc="Daily volume, last 7 days — re-aggregation over mv_usdc_daily "
        "(README.md:66-71; A9,T1)",
)
def q_readme_daily_volume_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    rollup = mv_usdc_daily_ts(transfers_df(spark, sf_dir))
    return (
        rollup.groupBy("day")
        .agg(F.sum("total_usdc").alias("daily_volume"),
             F.sum("tx_count").alias("daily_txs"))
        .orderBy(F.col("day").desc())
        .limit(7)
    )


@register(
    "readme_top_senders",
    oracle=oracle("""
, rollup AS (
  SELECT cast(block_number as bigint) // 7200 AS block_range, from_address,
         sum(value) AS total_sent, count(*) AS tx_count
  FROM transfers WHERE _sign = 1 GROUP BY 1, 2
)
SELECT from_address, sum(total_sent) AS volume
FROM rollup GROUP BY from_address
ORDER BY volume DESC, from_address LIMIT 10"""),
    doc="Top 10 senders by volume over mv_top_senders (README.md:73-78; T2)",
)
def q_readme_top_senders(spark: SparkSession, sf_dir: str) -> DataFrame:
    rollup = mv_top_senders(transfers_df(spark, sf_dir))
    return (
        rollup.groupBy("from_address")
        .agg(F.sum("total_sent").alias("volume"))
        .orderBy(F.col("volume").desc(), F.col("from_address"))
        .limit(10)
    )


@register(
    "readme_size_distribution",
    oracle=oracle("""
, rollup AS (
  SELECT CASE WHEN value < 100000000 THEN 'small'
              WHEN value < 1000000000 THEN 'medium'
              WHEN value < 10000000000 THEN 'large' ELSE 'whale' END AS size_bucket,
         CAST(block_timestamp AS DATE) AS day,
         count(*) AS tx_count, sum(value) AS total_volume
  FROM transfers WHERE _sign = 1 GROUP BY 1, 2
)
SELECT size_bucket, CAST(sum(tx_count) AS BIGINT) AS transactions, sum(total_volume) AS volume
FROM rollup GROUP BY size_bucket ORDER BY volume DESC, size_bucket"""),
    doc="Size-bucket totals over mv_tx_size_distribution (README.md:80-85)",
)
def q_readme_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    rollup = mv_tx_size_distribution(transfers_df(spark, sf_dir))
    return (
        rollup.groupBy("size_bucket")
        .agg(F.sum("tx_count").alias("transactions"),
             F.sum("total_volume").alias("volume"))
        .orderBy(F.col("volume").desc(), F.col("size_bucket"))
    )


@register(
    "monitoring_global_stats",
    oracle=oracle("""
SELECT count(*) AS total_rows,
       min(block_timestamp) AS earliest_block,
       max(block_timestamp) AS latest_block,
       sum(value) AS total_volume
FROM transfers WHERE _sign = 1"""),
    doc="Table health stats (monitoring.sql:31-37; A7)",
)
def q_monitoring_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return live(transfers_df(spark, sf_dir)).agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.min("block_timestamp").alias("earliest_block"),
        F.max("block_timestamp").alias("latest_block"),
        F.sum("value").alias("total_volume"),
    )


@register(
    "monitoring_recent_sample",
    oracle=oracle("""
SELECT block_timestamp, from_address, to_address, value, transaction_hash
FROM transfers WHERE _sign = 1
ORDER BY block_timestamp DESC, transaction_hash, log_index, _version DESC
LIMIT 10"""),
    doc="Sample recent transfers (monitoring.sql:39-50; T1) — "
        "tie-broken on (tx_hash, log_index, _version) for determinism",
)
def q_monitoring_recent_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        live(transfers_df(spark, sf_dir))
        .orderBy(F.col("block_timestamp").desc(), F.col("transaction_hash"),
                 F.col("log_index"), F.col("_version").desc())
        .limit(10)
        .select("block_timestamp", "from_address", "to_address",
                "value", "transaction_hash")
    )


@register(
    "retraction_net_daily",
    oracle=oracle("""
SELECT CAST(block_timestamp AS DATE) AS day,
       sum(value * _sign) AS net_volume,
       CAST(sum(_sign) AS BIGINT) AS net_count
FROM transfers
GROUP BY 1"""),
    doc="Retraction-aware (_sign-collapsing) aggregation: reorg-safe "
        "rollup algebra (SURVEY.md §2.9 O2; usdc-transfers/README.md:150)",
)
def q_retraction_net_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transfers_df(spark, sf_dir)
    return (
        t.groupBy(F.to_date("block_timestamp").alias("day"))
        .agg(F.sum(F.col("value") * F.col("_sign")).alias("net_volume"),
             F.sum("_sign").cast("long").alias("net_count"))
    )


@register(
    "dedup_latest_version",
    oracle=oracle("""
, ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY block_timestamp, transaction_hash, log_index
      ORDER BY _version DESC) AS _rn
  FROM transfers
)
SELECT log_id, block_number, block_timestamp, log_index, transaction_hash,
       from_address, to_address, value, _sign, _version
FROM ranked WHERE _rn = 1"""),
    doc="ReplacingMergeTree last-write-wins collapse over the full table "
        "(A6): row_number() over the sort key, keep max _version",
)
def q_dedup_latest_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    # wide=True: the LWW window shuffles FULL rows, so the synthesis is
    # the map stage (transfers_df docstring; 1.11 -> 0.74 s at sf0.1)
    t = transfers_df(spark, sf_dir, wide=True)
    w = Window.partitionBy("block_timestamp", "transaction_hash", "log_index") \
              .orderBy(F.col("_version").desc())
    return (
        t.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


@register(
    "events_json_daily",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       sum(CAST(value AS DECIMAL(18,2))) AS sum_value
FROM events
GROUP BY 1, 2""",
    doc="JSON extraction over events.props (get_json_object; SURVEY.md "
        "§2.8 footnote) — driver events table, no transfers CTE needed",
)
def q_events_json_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"),
                   "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.get_json_object("props", "$.k").cast("int")).alias("sum_k"),
             # decimal, not double: summation is exact → oracle-hash stable
             F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"))
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "events_type_pivot",
    oracle=f"""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       {", ".join(
           f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
           f" AS BIGINT) AS n_{t}" for t in EVENT_TYPES)}
FROM events
GROUP BY 1""",
    doc="PIVOT: one row per day, one count column per event type "
        "(explicit value list, so Spark skips the extra distinct-"
        "values pass and plans a single two-phase pivot aggregate — "
        "the wide-rollup shape dashboards ask for). Oracle expresses "
        "the identical result as conditional sums.",
)
def q_events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
                 for t in EVENT_TYPES])
