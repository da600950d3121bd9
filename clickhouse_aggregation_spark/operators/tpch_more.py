"""Additional join/aggregation coverage over the star schema:
forecast-revenue filter-agg (Q6-style), returned-items report
(Q10-style), conditional aggregation (Q14-style), and a large-order
semi-join (Q18-style) — rounding out the ad-hoc analytical surface the
bench exercises. Decimal money arithmetic throughout (oracle-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import load_table
from .registry import register


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(l_discount AS DECIMAL(18,2))) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24""",
    doc="Q6-style: pure filter-aggregate; every predicate must reach "
        "PushedFilters — the pushdown showcase.",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.04)
            & (F.col("l_quantity") < 24))
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_discount")).alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey LIMIT 20""",
    doc="Q10-style returned-items revenue: two broadcast dims + one "
        "fact-fact shuffle + top-20.",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
              .alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q14_conditional_share",
    oracle="""
SELECT sum(CASE WHEN p.p_type LIKE 'PROMO%'
           THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
           ELSE CAST(0 AS DECIMAL(18,2)) END) AS promo_revenue,
       sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS total_revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-07-01 00:00:00'""",
    doc="Q14-style conditional aggregation over a broadcast part join "
        "(promo revenue share; the ratio is left to the client to keep "
        "the oracle float-free).",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp")))
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.sum(F.when(F.col("p_type").like("PROMO%"), rev)
                   .otherwise(F.lit(0).cast("decimal(18,2)")))
              .alias("promo_revenue"),
             F.sum(rev).alias("total_revenue"))
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > 150
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       CAST(o.o_totalprice AS DECIMAL(18,2)) AS o_totalprice
FROM orders o
JOIN big b ON b.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
    doc="Q18-style large-order detection: grouped HAVING as a semi-join "
        "reduction before the dimension join.",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("_q"))
           .filter(F.col("_q") > 150)
           .select("l_orderkey"))
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "orders_with_returns_by_priority",
    oracle="""
SELECT o.o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_returnflag = 'R')
GROUP BY 1""",
    doc="Q4-shaped EXISTS semi-join (adapted to the driver schema: "
        "'has a returned line' instead of the missing commit/receipt "
        "dates): orders count per priority where any lineitem was "
        "returned. Plans as LeftSemi hash join — the probe side "
        "streams, the returned-lines build side is pre-filtered and "
        "deduplicated by the join itself (no DISTINCT pass).",
)
def q_orders_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum(_dec("o_totalprice")).cast("double").alias("total_price"))
    )


@register(
    "brands_never_discounted",
    oracle="""
SELECT p.p_brand,
       count(*) AS n_parts,
       count(DISTINCT p.p_size) AS n_sizes
FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey
                    AND l.l_discount >= 0.09)
GROUP BY 1""",
    doc="Q16-shaped NOT-EXISTS anti-join: per brand, parts that never "
        "shipped at a >=5% discount. Plans as LeftAnti hash join; the "
        "discounted-parts side is filtered before the join so the "
        "anti probe touches only qualifying keys.",
)
def q_brands_never_discounted(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    discounted = (li.filter(F.col("l_discount") >= 0.09)
                  .select("l_partkey"))
    return (
        p.join(discounted, p.p_partkey == discounted.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"),
             F.countDistinct("p_size").alias("n_sizes"))
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation (beyond-reference business analytics): the
# classic recency/frequency/monetary grid every marketing/retention
# pipeline computes. One combinable per-customer aggregate, the global
# anchor date as a 1-row broadcast, row-local bucket rules (integer
# day/count compares; money in exact cents), one tiny segment rollup.

RFM_R_ACTIVE_D = 180        # recency <= 180 days -> "active"
RFM_R_COOLING_D = 540       # <= 540 -> "cooling", else "lapsed"
RFM_F_HIGH = 12             # frequency >= 12 -> "high"
RFM_F_MID = 8               # >= 8 -> "mid", else "low"


@register(
    "orders_rfm_segments",
    oracle=f"""
WITH anchor AS (
  SELECT CAST(max(o_orderdate) AS DATE) AS maxd FROM orders
),
c AS (
  SELECT o_custkey,
         date_diff('day', CAST(max(o_orderdate) AS DATE),
                   (SELECT maxd FROM anchor)) AS r_days,
         count(*) AS f,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS m_cents
  FROM orders GROUP BY o_custkey
),
seg AS (
  SELECT CASE WHEN r_days <= {RFM_R_ACTIVE_D} THEN 'active'
              WHEN r_days <= {RFM_R_COOLING_D} THEN 'cooling'
              ELSE 'lapsed' END AS r_seg,
         CASE WHEN f >= {RFM_F_HIGH} THEN 'high'
              WHEN f >= {RFM_F_MID} THEN 'mid'
              ELSE 'low' END AS f_seg,
         m_cents
  FROM c
)
SELECT r_seg, f_seg,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(m_cents) AS BIGINT) AS total_cents,
       CAST(max(m_cents) AS BIGINT) AS max_cents
FROM seg GROUP BY 1, 2""",
    doc="RFM segmentation: per-customer recency (days vs the global "
        "anchor, a 1-row broadcast), frequency, exact-cents monetary, "
        "bucketed by integer threshold rules into a 3x3 grid with "
        "customer counts and monetary totals. Two combinable "
        "aggregates + row-local bucketing — no window, no skew risk.",
)
def q_orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("maxd"))
    c = (orders.groupBy("o_custkey")
         .agg(F.max(F.col("o_orderdate").cast("date")).alias("lastd"),
              F.count(F.lit(1)).alias("f"),
              F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
               .cast("long").alias("m_cents"))
         .crossJoin(F.broadcast(anchor))
         .withColumn("r_days", F.datediff("maxd", "lastd")))
    r_seg = (F.when(F.col("r_days") <= RFM_R_ACTIVE_D, "active")
             .when(F.col("r_days") <= RFM_R_COOLING_D, "cooling")
             .otherwise("lapsed"))
    f_seg = (F.when(F.col("f") >= RFM_F_HIGH, "high")
             .when(F.col("f") >= RFM_F_MID, "mid")
             .otherwise("low"))
    return (c.select(r_seg.alias("r_seg"), f_seg.alias("f_seg"), "m_cents")
            .groupBy("r_seg", "f_seg")
            .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
                 F.sum("m_cents").cast("long").alias("total_cents"),
                 F.max("m_cents").cast("long").alias("max_cents")))
