"""Ad-hoc SQL-text query surface (SURVEY.md §3.3).

The reference's interactive surface is ClickHouse SQL text over the
maintained rollups (usdc-transfers/README.md:65-85). The rebuild's
equivalent is ``spark.sql`` over registered temp views — same Catalyst
plan as the DataFrame API, but the user-facing contract is a SQL
string. These queries are deliberately written as SQL text (not
DataFrame calls) to exercise that path end-to-end, including view
resolution over the synthesized transfers table and a rollup view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views
from ..sources.transfers import with_transfers
from .registry import register
from .rollups import oracle


def _sql_env(spark: SparkSession, sf_dir: str) -> None:
    register_views(spark, sf_dir)
    with_transfers(spark, sf_dir)          # temp view `transfers`


@register(
    "sql_adhoc_daily_volume",
    oracle=oracle("""
, mv_usdc_daily AS (
  SELECT CAST(block_timestamp AS DATE) AS day, from_address, to_address,
         sum(value) AS total_usdc, count(*) AS tx_count
  FROM transfers WHERE _sign = 1 GROUP BY 1, 2, 3
)
SELECT day, sum(total_usdc) AS daily_volume,
       CAST(sum(tx_count) AS BIGINT) AS daily_txs
FROM mv_usdc_daily GROUP BY day ORDER BY day DESC LIMIT 7"""),
    doc="The reference's headline query VERBATIM as SQL text "
        "(README.md:66-71) through spark.sql over a rollup view — "
        "the interactive ClickHouse-client surface (§3.3).",
)
def q_sql_adhoc_daily_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    _sql_env(spark, sf_dir)
    spark.sql("""
        CREATE OR REPLACE TEMP VIEW mv_usdc_daily AS
        SELECT to_date(block_timestamp) AS day, from_address, to_address,
               sum(value) AS total_usdc, count(*) AS tx_count
        FROM transfers WHERE _sign = 1 GROUP BY 1, 2, 3""")
    return spark.sql("""
        SELECT day, sum(total_usdc) AS daily_volume,
               sum(tx_count) AS daily_txs
        FROM mv_usdc_daily
        GROUP BY day ORDER BY day DESC LIMIT 7""")


@register(
    "sql_adhoc_whale_report",
    oracle=oracle("""
SELECT CAST(block_timestamp AS DATE) AS day,
       count(*) AS whale_txs,
       sum(value) AS whale_volume,
       count(DISTINCT from_address) AS whale_senders
FROM transfers
WHERE _sign = 1 AND value >= 10000000000
GROUP BY 1
ORDER BY day"""),
    doc="Ad-hoc SQL text with a selective value predicate (the "
        "reference's high-value partial-index use case, "
        "performance-optimization.sql:51-53 — here parquet min/max "
        "stats + pushdown replace the partial index).",
)
def q_sql_adhoc_whale_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    _sql_env(spark, sf_dir)
    return spark.sql("""
        SELECT to_date(block_timestamp) AS day,
               count(*) AS whale_txs,
               sum(value) AS whale_volume,
               count(DISTINCT from_address) AS whale_senders
        FROM transfers
        WHERE _sign = 1 AND value >= 10000000000
        GROUP BY 1
        ORDER BY day""")
