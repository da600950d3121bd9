"""Raw EVM log fixture (FIXTURES.md §2) — the undecoded form of the
transfers stream, synthesized deterministically so the ABI-decode
operator (reference: usdc-transfers/src/main.ts:83-94, src/abi/
usdc.ts:20) has a golden input.

Layout reproduces real EVM Transfer logs:
  topic0   = event signature hash (constant per event type)
  topic1/2 = indexed from/to addresses, left-padded to 32 bytes
  data     = uint256 value, 32-byte big-endian hex
A slice of rows carries a foreign contract address or topic0 so the
source-filter pushdown (main.ts:46-50, re-check :83-84) has something
to reject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .transfers import transfers_df

# reference usdc-transfers/src/main.ts:16-17 (public constants)
USDC_ADDRESS = "0xa0b86991c6218b36c1d19d4a2e9eb0ce3606eb48"
TRANSFER_TOPIC = "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
OTHER_ADDRESS = "0x" + "dead" * 10
OTHER_TOPIC = "0x" + "beef" * 16


def _pad_topic(addr40: F.Column) -> F.Column:
    """address (40 hex chars, no 0x) -> 32-byte topic hex."""
    return F.concat(F.lit("0x"), F.lpad(addr40, 64, "0"))


def raw_logs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode live v1 transfers into raw log rows; every 7th log is a
    foreign contract, every 11th a foreign event."""
    # wide=True: the encode+decode round-trip materializes every
    # synthesized column, so the projection is the map stage (see
    # transfers_df docstring; measured 0.90 -> 0.47 s at sf0.1)
    t = transfers_df(spark, sf_dir, wide=True).filter(
        (F.col("_sign") == 1) & (F.col("_version") == 1))
    ev_ord = F.col("log_index").cast("long") + F.col("block_number").cast("long")
    return t.select(
        "log_id",
        "block_number",
        F.when(ev_ord % 7 == 3, OTHER_ADDRESS)
         .otherwise(USDC_ADDRESS).alias("address"),
        F.when(ev_ord % 11 == 5, OTHER_TOPIC)
         .otherwise(TRANSFER_TOPIC).alias("topic0"),
        _pad_topic(F.substring("from_address", 3, 40)).alias("topic1"),
        _pad_topic(F.substring("to_address", 3, 40)).alias("topic2"),
        # 32-byte big-endian uint256; fixture values fit a long
        F.concat(F.lit("0x"),
                 F.lpad(F.lower(F.hex(F.col("value").cast("long"))), 64, "0"))
         .alias("data"),
        "transaction_hash",
    )
