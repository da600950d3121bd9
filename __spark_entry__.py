"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are generated from the engine's
declared-query registry (clickhouse_aggregation_spark/operators/
registry.py) — one entry per implemented operator from SURVEY.md §2.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from clickhouse_aggregation_spark.operators import REGISTRY  # noqa: E402
from clickhouse_aggregation_spark.operators.registry import declared_order  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the reference's headline analytics query: daily USDC
    volume over the daily rollup (usdc-transfers/README.md:66-71).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return REGISTRY["readme_daily_volume_7d"].fn(spark, "/root/testdata/sf0.001")


def _wrap(fn) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        # the driver may hand us its own session: make sure the two
        # confs the engine relies on are set (both are runtime-safe).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # declared_order(): oracle-paired queries first — the driver checks
    # (at most) the first 50 entries, so ordering is part of the contract
    return {name: _wrap(REGISTRY[name].fn) for name in declared_order()}


def oracle_sql() -> dict[str, str]:
    return {name: REGISTRY[name].oracle for name in declared_order()
            if REGISTRY[name].oracle is not None}
