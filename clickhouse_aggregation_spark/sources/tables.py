"""Parquet table loaders for the driver's synthetic star schema.

Maps the reference's source surface (SURVEY.md §2.1 S1/S4/S5): the
archive-gateway bulk source with server-side filter/projection pushdown
becomes ``spark.read.parquet`` — Catalyst pushes predicates to parquet
row-group stats and prunes columns automatically, which is the same
pushdown contract the gateway provides (reference:
usdc-transfers/src/main.ts:24,46-57).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import DRIVER_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table. Parquet carries its own (fixed) schema;
    filter pushdown / column pruning happen in Catalyst.

    Timestamp columns arrive as epoch-nanos BIGINT (see
    ``spark.sql.legacy.parquet.nanosAsLong`` in session.py); convert to
    microsecond TimestampType here so downstream operators see real
    timestamps. The cast is a narrow projection — still pushdown-safe.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name in _NANOS_TS_COLUMNS and field.dataType.simpleString() == "bigint":
            # integer truncation nanos -> micros, then exact micros ->
            # timestamp; no float rounding anywhere.
            df = df.withColumn(
                field.name, F.expr(f"timestamp_micros({field.name} div 1000)"))
    return df


# columns stored as TIMESTAMP(NANOS) in the driver parquet
_NANOS_TS_COLUMNS = {"ts"}


def ensure_parallelism(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    """Round-robin repartition iff the scan yields fewer splits than the
    cluster has cores.

    CPU-bound per-row operators (shingling, per-row minhash, Pandas-UDF
    feature extraction) are bottlenecked by input-split count, not data
    size: a small file = one split = one core. At 100 TB inputs arrive
    in thousands of splits and this is a no-op; on a skinny input the
    one extra shuffle of raw rows buys full-cluster parallelism for the
    expensive stage that follows.
    """
    spark = df.sparkSession
    target = int(spark.sparkContext.defaultParallelism * min_factor)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = DRIVER_TABLES) -> None:
    """Register every driver table as a temp view so ``spark.sql`` text
    mirrors the DuckDB-oracle environment (same view names)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
