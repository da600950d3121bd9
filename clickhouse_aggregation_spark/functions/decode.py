"""EVM ABI scalar decode (SURVEY.md §2.8 F9, §2.10 D2).

Decoders for the fixed binary layouts in EVM logs (reference:
usdc-transfers/src/abi/usdc.ts:6-22 declares the codecs; main.ts:86
applies them). Native column expressions for the hot path; a Pandas UDF
only for full-range uint256 (beyond 2^63), which Spark's ``conv`` can't
represent — Arrow-batched, never row-at-a-time.
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd

from pyspark.sql import Column, functions as F, types as T


def topic_address(topic: Column) -> Column:
    """32-byte topic hex -> 20-byte address: '0x' + last 40 hex chars
    (addresses are right-aligned in indexed topics)."""
    return F.concat(F.lit("0x"), F.substring(topic, 27, 40))


def hex_uint64(data: Column) -> Column:
    """32-byte data word -> Decimal(38,0), native path (values < 2^63).

    ``conv`` works on the significant digits after stripping the 0x and
    leading zeros — stays inside whole-stage codegen.
    """
    digits = F.regexp_replace(F.substring(data, 3, 64), "^0+", "")
    return F.when(digits == "", F.lit(0).cast("decimal(38,0)")) \
            .otherwise(F.conv(digits, 16, 10).cast("decimal(38,0)"))


@F.pandas_udf(T.DecimalType(38, 0))
def hex_uint256(data: pd.Series) -> pd.Series:
    """Full-range uint256 decode (Arrow-batched). Values above
    Decimal(38,0)'s 38 digits (uint256 max has 78) overflow to NULL —
    the documented engine-wide limitation (SURVEY.md §1.2); carry the
    raw hex alongside when full fidelity matters."""
    def conv(h: str):
        v = int(h[2:], 16) if h and h != "0x" else 0
        return Decimal(v) if v < 10 ** 38 else None
    return data.map(conv)


# ---------------------------------------------------------------------------
# Full-range uint256 (closing the Decimal(38,0) ceiling, SURVEY §1.2):
# the reference itself never computes on full-range BigInt — it
# MARSHALS it as a decimal string (usdc-transfers/src/model/generated/
# marshal.ts:57-65, `fromJSON: ... BigInt(String(value))`). The engine
# adopts the same contract: numeric work happens in Decimal(38,0)
# (covers all real USDC values), and full-fidelity transport/compare
# uses the exact decimal-string codec below. Comparison/sorting on the
# string form is native (zero-pad to 78 digits → lexicographic order
# IS numeric order), so only the edge codec itself leaves the JVM —
# Arrow-batched, never row-at-a-time.

UINT256_MAX_DIGITS = 78  # len(str(2**256 - 1))


@F.pandas_udf(T.StringType())
def hex_uint256_string(data: pd.Series) -> pd.Series:
    """Exact full-range uint256 decode to a decimal string (the
    reference's BigInt JSON-marshal form). Never overflows."""
    return data.map(
        lambda h: str(int(h[2:], 16)) if h and h != "0x" else "0")


@F.pandas_udf(T.StringType())
def uint256_string_to_hex(dec: pd.Series) -> pd.Series:
    """Reverse marshal: decimal string -> 0x-padded 32-byte hex word."""
    return dec.map(lambda s: "0x" + format(int(s), "064x"))


def uint256_sort_key(dec_str: Column) -> Column:
    """Native ordering key for decimal-string uint256: zero-pad to 78
    digits so lexicographic order equals numeric order. Stays inside
    whole-stage codegen — sorts/joins/comparisons on full-range values
    never need Python."""
    return F.lpad(dec_str, UINT256_MAX_DIGITS, "0")


def abi_event_select(event: str) -> list[Column]:
    """D2 codegen: an ABI event signature -> decode expression list.

    The reference generates typed decoders from the ABI JSON
    (``sqd typegen`` -> src/abi/usdc.ts); here the same role is a
    tiny expression generator. Only the shapes the reference uses are
    implemented: indexed address topics + one uint256 data word.
    """
    assert event == "Transfer(address,address,uint256)", (
        "codegen currently covers the reference's event shape")
    return [
        topic_address(F.col("topic1")).alias("from_address"),
        topic_address(F.col("topic2")).alias("to_address"),
        hex_uint64(F.col("data")).alias("value"),
    ]
