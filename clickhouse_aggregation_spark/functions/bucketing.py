"""Time / block bucketing functions (SURVEY.md §2.8 F1-F7).

These reproduce the reference's ClickHouse scalar functions bit-for-bit
so golden tests hash-match:

  intDiv(block, 7200)   ~ 1 day   (reference: usdc-transfers/sql/analytics.sql:19)
  intDiv(block, 300)    ~ 1 hour  (analytics.sql:31)
  intDiv(block, 100000) partition (analytics.sql:11)
  toDate / toStartOfHour / toYYYYMM / toYYYYMMDD
                                  (scripts/setup-analytics.sh:58,74;
                                   analytics.sql:58,73,93)
  multiIf size buckets            (analytics.sql:77-82)

All are native Column expressions — they stay inside whole-stage
codegen and remain partition-pruning-friendly when used as partition
columns at write time.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

BLOCKS_PER_DAY = 7200    # ~12 s blocks (analytics.sql:19)
BLOCKS_PER_HOUR = 300    # analytics.sql:31

# histogram edges in micro-USDC (analytics.sql:77-82)
SIZE_EDGES = (100_000_000, 1_000_000_000, 10_000_000_000)


def int_div(col: Column, divisor: int) -> Column:
    """ClickHouse ``intDiv`` for non-negative integers — exact for the
    full long range.

    Spark's ``/`` is double division (loses low bits above 2^53), so
    the exact multiple ``c - c % divisor`` is divided in DECIMAL(38,0)
    space — the quotient is integral, and the decimal division of
    integral operands yields it exactly before the cast back to long.
    Still pure column expressions inside whole-stage codegen.
    """
    c = col.cast("long")
    exact_multiple = (c - c % divisor).cast("decimal(38,0)")
    return (exact_multiple / F.lit(divisor).cast("decimal(38,0)")) \
        .cast("decimal(38,0)").cast("long")


def block_range_day(block: Column) -> Column:
    """``intDiv(block, 7200)`` — day-granularity block bucket."""
    return int_div(block, BLOCKS_PER_DAY)


def block_hour(block: Column) -> Column:
    """``intDiv(block, 300)`` — hour-granularity block bucket."""
    return int_div(block, BLOCKS_PER_HOUR)


def block_partition(block: Column, granularity: int = 100_000) -> Column:
    """``intDiv(block, 100000)`` — physical partition bucket."""
    return int_div(block, granularity)


def to_day(ts: Column) -> Column:
    """ClickHouse ``toDate``."""
    return F.to_date(ts)


def to_start_of_hour(ts: Column) -> Column:
    """ClickHouse ``toStartOfHour``."""
    return F.date_trunc("hour", ts)


def to_yyyymm(ts: Column) -> Column:
    """ClickHouse ``toYYYYMM`` — numeric month partition key."""
    return F.date_format(ts, "yyyyMM").cast("int")


def to_yyyymmdd(ts: Column) -> Column:
    """ClickHouse ``toYYYYMMDD`` — numeric day partition key."""
    return F.date_format(ts, "yyyyMMdd").cast("int")


def size_bucket(value: Column) -> Column:
    """``multiIf(value<1e8,'small', <1e9,'medium', <1e10,'large','whale')``."""
    return (
        F.when(value < SIZE_EDGES[0], "small")
        .when(value < SIZE_EDGES[1], "medium")
        .when(value < SIZE_EDGES[2], "large")
        .otherwise("whale")
    )


# SQL fragment used on the DuckDB-oracle side for size_bucket — kept
# adjacent so the two stay in sync.
SIZE_BUCKET_SQL = (
    "CASE WHEN value < 100000000 THEN 'small' "
    "WHEN value < 1000000000 THEN 'medium' "
    "WHEN value < 10000000000 THEN 'large' ELSE 'whale' END"
)
