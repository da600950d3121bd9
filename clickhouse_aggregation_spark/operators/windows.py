"""Session windows and range joins (SURVEY.md §2.9 footnote; pyspark
guide "Common OLAP patterns").

``events_sessionization`` uses Spark's built-in ``session_window``
(gap-merged event-time windows) — the declarative sibling of the
``applyInPandasWithState`` operator in streaming/stateful.py. Its
oracle is the classic lag/cumsum sessionization in SQL, so the two
formulations cross-check each other.

``events_cooccurrence_5min`` is the bucketed range join: |t1 - t2| <= 5
minutes implemented as an equi-join on 5-minute time cells (each left
row joins its own and the adjacent cell) + a residual filter. At 100 TB
this is THE way to do interval joins — the shuffle key is the cell, so
candidate pairs are bounded by cell occupancy instead of |L| x |R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import load_table
from .registry import register

SESSION_GAP = "30 minutes"
COOC_WINDOW_S = 300


@register(
    "events_sessionization",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                 OR date_part('epoch', ts) - date_part('epoch', prev_ts) >= 1800
            THEN 1 ELSE 0 END AS new_session
  FROM ordered
),
sessions AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       date_trunc('second', min(ts)) AS session_start,
       count(*) AS n_events,
       sum(CAST(value AS DECIMAL(18,2))) AS total_value
FROM sessions GROUP BY user_id, sid""",
    doc="Sessionization via the built-in session_window (30-min gap); "
        "oracle is the lag/cumsum formulation — the two classic "
        "sessionization algorithms must agree exactly.",
)
def q_events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", SESSION_GAP).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
             F.min("ts").alias("_start"))
        .select("user_id",
                F.date_trunc("second", "_start").alias("session_start"),
                "n_events", "total_value")
    )


@register(
    "events_cooccurrence_5min",
    oracle=f"""
WITH e AS (
  SELECT event_id, event_type,
         CAST(floor(date_part('epoch', ts)) AS BIGINT) AS ts_s
  FROM events
),
cells AS (
  SELECT *, ts_s // {COOC_WINDOW_S} AS cell FROM e
),
-- probe-cell explosion + EQUI join, the same formulation the Spark
-- side uses: DuckDB executes this as a multithreaded hash join on the
-- cell key. The previous "b.cell BETWEEN a.cell-1 AND a.cell+1" form
-- planned as an inequality join that degenerated to ~|L|x|R| work on
-- dense fixtures (the round-5 sf1.0 sweep sat on it for 40+ minutes;
-- this form finishes in seconds on the same data).
b AS (
  SELECT event_id, event_type, ts_s,
         unnest([cell - 1, cell, cell + 1]) AS probe
  FROM cells
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM cells a
  JOIN b
    ON a.cell = b.probe
   AND a.event_id < b.event_id
   AND abs(a.ts_s - b.ts_s) <= {COOC_WINDOW_S}
)
SELECT type_a, type_b, count(*) AS n_pairs
FROM pairs GROUP BY 1, 2""",
    doc="Bucketed range join: event pairs within 5 minutes via "
        "time-cell equi-join (own + adjacent cell) + residual filter — "
        "candidate pairs bounded by cell occupancy, not |L|x|R|.",
)
def q_events_cooccurrence_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("event_id", "event_type",
                  F.unix_timestamp("ts").alias("ts_s"))
    cells = e.withColumn("cell", F.expr(f"ts_s div {COOC_WINDOW_S}"))
    a = cells.alias("a")
    # explode left rows into their cell and both neighbors, then a pure
    # equi-join on the cell key (shuffle-friendly at any scale)
    b = (cells.withColumn("probe",
                          F.explode(F.array(F.col("cell") - 1, F.col("cell"),
                                            F.col("cell") + 1)))
         .select(F.col("event_id").alias("b_id"),
                 F.col("event_type").alias("type_b"),
                 F.col("ts_s").alias("b_ts"), "probe"))
    pairs = (
        a.join(b, (F.col("a.cell") == F.col("probe"))
               & (F.col("a.event_id") < F.col("b_id"))
               & (F.abs(F.col("a.ts_s") - F.col("b_ts")) <= COOC_WINDOW_S))
        .select(F.col("a.event_type").alias("type_a"), "type_b")
    )
    return pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_pairs"))


@register(
    "events_running_user_stats",
    oracle="""
WITH w AS (
  SELECT user_id, event_id, CAST(value AS DECIMAL(18,2)) AS v,
         sum(CAST(value AS DECIMAL(18,2))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_value,
         CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / count(*) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS avg_last3,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS seq
  FROM events
)
SELECT user_id, event_id, running_value,
       avg_last3, CAST(seq AS BIGINT) AS seq
FROM w WHERE seq <= 5""",
    doc="Window frame specs (beyond-reference W family): per-user "
        "running sum (unbounded preceding) and 3-row moving average "
        "over the event timeline, first 5 events per user. ONE window "
        "shuffle serves all three functions (same partitioning/order); "
        "sums run in DECIMAL so both engines agree exactly, and the "
        "moving average is the exact decimal sum cast to double, "
        "divided by the frame row count (one IEEE division; native "
        "avg(decimal) rounds to a different scale per engine) — "
        "deterministic on both engines. Tie-broken by (ts, event_id).",
)
def q_events_running_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,2)")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = wo.rowsBetween(Window.unboundedPreceding, 0)
    last3 = wo.rowsBetween(-2, 0)
    out = ev.select(
        "user_id", "event_id",
        F.sum(v).over(running).alias("running_value"),
        (F.sum(v).over(last3).cast("double")
         / F.count(F.lit(1)).over(last3)).alias("avg_last3"),
        F.row_number().over(wo).cast("long").alias("seq"))
    return out.filter(F.col("seq") <= 5)


def _setops_oracle() -> str:
    from ..sources.transfers import TRANSFERS_ORACLE_CTE
    return f"""
WITH {TRANSFERS_ORACLE_CTE},
live AS (SELECT * FROM transfers WHERE _sign = 1),
both_roles AS (
  SELECT from_address AS address FROM live
  INTERSECT
  SELECT to_address FROM live
),
send_only AS (
  SELECT from_address AS address FROM live
  EXCEPT
  SELECT to_address FROM live
)
SELECT 'both' AS role, CAST(count(*) AS BIGINT) AS n_addresses
FROM both_roles
UNION ALL
SELECT 'send_only' AS role, CAST(count(*) AS BIGINT) AS n_addresses
FROM send_only"""


@register(
    "address_flow_setops",
    oracle=_setops_oracle(),
    doc="Set operations (SURVEY §2.7 'not present, free in Spark'): "
        "addresses that both sent and received (INTERSECT) vs sent "
        "only (EXCEPT), counted. Computed as ONE role-flag "
        "aggregation over the stacked (address, sent, received) "
        "rows — single scan, single exchange; set-op equivalent "
        "because INTERSECT/EXCEPT are distinct-based and null-safe "
        "exactly like the address groupBy.",
)
def q_address_flow_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.transfers import transfers_df
    t = transfers_df(spark, sf_dir).filter(F.col("_sign") == 1)
    # OPTIMIZATION r12 (guide §2.3/§2.4): INTERSECT and EXCEPT each
    # planned as distinct-aggregate-both-sides + a hash join — four
    # scans of transfers and five exchanges for two counts. The same
    # two counts are one role-flag aggregation: per distinct address,
    # did it ever send / ever receive (max of two 0/1 flags), then
    # both = sent∧received, send_only = sent∧¬received. Set-op
    # equivalence: INTERSECT/EXCEPT are DISTINCT-based and null-safe,
    # exactly like groupBy on the address key, so row-for-row the
    # grouped keys ARE the distinct union of both sides. One scan
    # (stack emits the sender and receiver role rows in place), one
    # exchange (the address groupBy; map-side partial max applies),
    # then a 1-row final aggregate reshaped to the two labeled rows.
    roles = t.selectExpr(
        "stack(2, from_address, 1, 0, to_address, 0, 1) "
        "AS (address, s, r)")
    per_addr = roles.groupBy("address").agg(F.max("s").alias("s"),
                                            F.max("r").alias("r"))
    counts = per_addr.agg(
        F.count(F.when((F.col("s") == 1) & (F.col("r") == 1), 1))
        .alias("n_both"),
        F.count(F.when((F.col("s") == 1) & (F.col("r") == 0), 1))
        .alias("n_send_only"))
    return counts.selectExpr(
        "stack(2, 'both', n_both, 'send_only', n_send_only) "
        "AS (role, n_addresses)")
