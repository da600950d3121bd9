"""Join / analytical queries over the driver's TPC-H-ish star schema.

The reference implements no joins (SURVEY.md §2.3 — verified: no JOIN
anywhere in its src/ or sql/); joins come from Spark. These queries
exercise the engine's join strategies for capability parity and feed
the bench harness:

* dimension joins are explicitly ``F.broadcast`` (region/nation/
  customer/supplier/part stay dimension-sized at any fact scale),
* fact-fact joins (orders ⋈ lineitem) shuffle on the join key and are
  AQE-coalesced / skew-split at runtime,
* all money arithmetic is cast to DECIMAL before aggregation so both
  Spark and the DuckDB oracle sum exactly (no float-order noise).

Spark plans to check (see tests/test_plans.py): broadcast hash joins
for dims, filter pushdown to parquet for the date predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.tables import load_table
from .registry import register


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


@register(
    "tpch_q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
       sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
       sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""",
    doc="TPC-H Q1-style pricing summary: scan + 2-key hash aggregate; "
        "the date filter must push down to the parquet scan",
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty"),
             F.sum(_dec("l_extendedprice")).alias("sum_base_price"),
             F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
              .alias("sum_disc_price"),
             F.count(F.lit(1)).alias("count_order"))
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    doc="TPC-H Q3-style: broadcast dim join + fact-fact shuffle join + "
        "grouped revenue + top-k (TakeOrderedAndProject)",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
              .alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
SELECT n.n_name,
       sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name""",
    doc="TPC-H Q5-style 6-table join: all dims broadcast, single "
        "fact-fact shuffle; local-supplier condition on nationkey",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n.join(F.broadcast(r),
                                 n.n_regionkey == r.r_regionkey)),
              c.c_nationkey == F.col("n_nationkey"))
        .join(F.broadcast(s),
              (li.l_suppkey == s.s_suppkey)
              & (s.s_nationkey == F.col("n_nationkey")))
        .groupBy("n_name")
        .agg(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
              .alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "top_customers_per_nation",
    oracle="""
WITH spend AS (
  SELECT c.c_nationkey, c.c_custkey, c.c_name,
         sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS total_spend
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT n.n_name, s.c_custkey, s.c_name, s.total_spend,
         row_number() OVER (PARTITION BY s.c_nationkey
                            ORDER BY s.total_spend DESC, s.c_custkey) AS rk
  FROM spend s JOIN nation n ON n.n_nationkey = s.c_nationkey
)
SELECT n_name, c_custkey, c_name, total_spend, rk
FROM ranked WHERE rk <= 3""",
    doc="Top-3 customers by spend per nation: window rank over grouped "
        "join (SURVEY.md §2.5 — beyond-reference window usage)",
)
def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    spend = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "c_custkey", "c_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total_spend"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("total_spend").desc(), F.col("c_custkey"))
    return (
        spend.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("n_name", "c_custkey", "c_name", "total_spend", "rk")
    )


@register(
    "orders_priority_by_month",
    oracle="""
SELECT CAST(strftime(o_orderdate, '%Y%m') AS INTEGER) AS order_month,
       o_orderpriority,
       count(*) AS n_orders,
       sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total_price
FROM orders
GROUP BY 1, 2""",
    doc="Monthly order-priority rollup: toYYYYMM-style numeric month key "
        "(F5) over the orders fact",
)
def q_orders_priority_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyyMM").cast("int")
                  .alias("order_month"),
                  "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total_price"))
    )
