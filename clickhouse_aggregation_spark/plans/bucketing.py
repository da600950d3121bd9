"""Bucketed tables for shuffle-free co-located joins (SURVEY.md §2.6
T3 / pyspark guide bucketing).

The reference clusters MergeTree tables by sort key so key-prefix scans
and merges are cheap (usdc-transfers/sql/analytics.sql:12). Spark's
equivalent for the JOIN side of that story is bucketing: write both
fact tables bucketed by the join key and Catalyst plans a SortMergeJoin
with NO Exchange — at 100 TB this removes the dominant shuffle from
every orders ⋈ lineitem query.

Bucketed tables must live in the session catalog (saveAsTable);
``prepare_bucketed_pair`` writes the two driver fact tables bucketed by
order key into the given warehouse and returns the joined plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table

N_BUCKETS = 8


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = N_BUCKETS) -> None:
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def prepare_bucketed_pair(spark: SparkSession, sf_dir: str,
                          n_buckets: int = N_BUCKETS) -> DataFrame:
    """Write orders+lineitem bucketed by order key; return their join
    (which must plan without a shuffle — asserted in tests)."""
    write_bucketed(load_table(spark, sf_dir, "orders"),
                   "orders_bucketed", "o_orderkey", n_buckets)
    write_bucketed(load_table(spark, sf_dir, "lineitem"),
                   "lineitem_bucketed", "l_orderkey", n_buckets)
    o = spark.table("orders_bucketed")
    li = spark.table("lineitem_bucketed")
    return li.join(o, li.l_orderkey == o.o_orderkey)
