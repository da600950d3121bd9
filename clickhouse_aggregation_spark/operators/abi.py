"""ABI-decode pipeline operator (SURVEY.md §2.2 P1-P3, §2.10 D2) and
the tiering union query (§2.7 U2).

The decode query reproduces the reference's per-log pipeline
(usdc-transfers/src/main.ts:83-94): re-check the source filter
(address + topic0), decode the event, construct the typed row. The
oracle reconstructs the expected output from the generator instead of
re-implementing hex decode in DuckDB — verifying the decode as a
round-trip (encode in raw_logs.py, decode here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.decode import abi_event_select
from ..sources.raw_logs import TRANSFER_TOPIC, USDC_ADDRESS, raw_logs_df
from ..sources.transfers import TRANSFERS_ORACLE_CTE
from .registry import register


@register(
    "abi_decode_transfers",
    oracle=f"""
WITH {TRANSFERS_ORACLE_CTE}
SELECT log_id, block_number, from_address, to_address, value,
       transaction_hash
FROM transfers
WHERE _sign = 1 AND _version = 1
  AND (CAST(log_index AS BIGINT) + block_number) % 7 <> 3
  AND (CAST(log_index AS BIGINT) + block_number) % 11 <> 5""",
    doc="Raw EVM logs → typed transfer rows: client-side filter re-check "
        "(P1: address=USDC ∧ topic0=Transfer), ABI decode via generated "
        "expressions (P2/D2: address slice + uint256 conv), row "
        "construction (P3). Round-trip-verified against the generator.",
)
def q_abi_decode_transfers(spark: SparkSession, sf_dir: str) -> DataFrame:
    logs = raw_logs_df(spark, sf_dir)
    return (
        logs.filter((F.col("address") == USDC_ADDRESS)
                    & (F.col("topic0") == TRANSFER_TOPIC))
        .select("log_id", "block_number",
                *abi_event_select("Transfer(address,address,uint256)"),
                "transaction_hash")
    )


@register(
    "tiered_union_stats",
    oracle=f"""
WITH {TRANSFERS_ORACLE_CTE},
thr AS (SELECT max(block_number) - 100000 AS cutoff FROM transfers),
tiered AS (
  SELECT 'archive' AS tier, t.* FROM transfers t, thr
  WHERE t.block_number < thr.cutoff
  UNION ALL
  SELECT 'hot' AS tier, t.* FROM transfers t, thr
  WHERE t.block_number >= thr.cutoff
)
SELECT tier, count(*) AS n_rows,
       sum(value * _sign) AS net_volume,
       min(block_number) AS min_block, max(block_number) AS max_block
FROM tiered GROUP BY tier""",
    doc="Hot/archive tier split + UNION ALL compatibility view (U2, "
        "archive-strategy.sql:41-44): per-tier stats over the unioned "
        "logical table. The physical counterpart (partition moves) is "
        "plans/tiering.py.",
)
def q_tiered_union_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.transfers import transfers_df
    t = transfers_df(spark, sf_dir)
    thr = t.agg((F.max("block_number") - 100_000).alias("cutoff"))
    tt = t.join(F.broadcast(thr))
    archive = tt.filter(F.col("block_number") < F.col("cutoff")) \
                .withColumn("tier", F.lit("archive"))
    hot = tt.filter(F.col("block_number") >= F.col("cutoff")) \
            .withColumn("tier", F.lit("hot"))
    return (
        archive.unionByName(hot)
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum(F.col("value") * F.col("_sign")).alias("net_volume"),
             F.min("block_number").alias("min_block"),
             F.max("block_number").alias("max_block"))
    )
