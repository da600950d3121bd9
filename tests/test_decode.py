"""Unit tests for the ABI decode functions, incl. the full-range
uint256 Pandas UDF that the native conv path can't cover."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from clickhouse_aggregation_spark.functions.decode import (
    hex_uint64, hex_uint256, topic_address,
)


def _word(v: int) -> str:
    return "0x" + format(v, "064x")


def test_hex_uint64_and_topic_address(spark):
    rows = [(_word(0), "0x" + "00" * 12 + "ab" * 20),
            (_word(1), "0x" + "00" * 12 + "cd" * 20),
            (_word(123_456_789_000), "0x" + "00" * 12 + "ef" * 20)]
    df = spark.createDataFrame(rows, "data string, topic1 string")
    out = df.select(hex_uint64(F.col("data")).alias("v"),
                    topic_address(F.col("topic1")).alias("a")).collect()
    assert [r["v"] for r in out] == [Decimal(0), Decimal(1),
                                     Decimal(123_456_789_000)]
    assert out[0]["a"] == "0x" + "ab" * 20
    assert all(len(r["a"]) == 42 for r in out)


def test_hex_uint256_pandas_udf_full_range(spark):
    big = 2 ** 120          # far beyond conv's 64-bit range, fits 38 digits
    too_big = 10 ** 38      # beyond Decimal(38,0): documented overflow->NULL
    df = spark.createDataFrame(
        [(_word(0),), (_word(big),), (_word(too_big),), (_word(7),)],
        "data string")
    out = [r[0] for r in df.select(hex_uint256(F.col("data"))).collect()]
    assert out[0] == Decimal(0)
    assert out[1] == Decimal(big)
    assert out[2] is None
    assert out[3] == Decimal(7)


def test_uint256_string_marshal_full_range(spark):
    """The reference's BigInt contract is a decimal-STRING marshal
    (marshal.ts:57-65); the string codec must be exact over the whole
    uint256 range — including values past Decimal(38,0) and DuckDB
    HUGEINT — and round-trip through the hex word form."""
    from clickhouse_aggregation_spark.functions.decode import (
        hex_uint256_string, uint256_sort_key, uint256_string_to_hex,
    )
    u256_max = 2 ** 256 - 1
    vals = [0, 7, 10 ** 38, u256_max, 2 ** 255, 12345678901234567890]
    df = spark.createDataFrame([( _word(v),) for v in vals], "data string")
    dec = df.select(F.col("data"),
                    hex_uint256_string(F.col("data")).alias("s"))
    out = dec.collect()
    assert [r["s"] for r in out] == [str(v) for v in vals]
    # round-trip: string -> hex == original word
    rt = dec.select((uint256_string_to_hex(F.col("s")) == F.col("data"))
                    .alias("ok")).collect()
    assert all(r["ok"] for r in rt)
    # native sort key: lexicographic order == numeric order
    ordered = [r["s"] for r in
               dec.orderBy(uint256_sort_key(F.col("s"))).collect()]
    assert ordered == [str(v) for v in sorted(vals)]
