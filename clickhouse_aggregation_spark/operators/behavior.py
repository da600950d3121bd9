"""Behavioral analytics over the event stream (beyond-reference
surface): cohort retention and a ClickHouse-``windowFunnel``-style
conversion funnel — the two classic event-table rollups the reference's
ClickHouse layer would serve with one function call each.

Determinism: day arithmetic is integer date math (both engines bucket
``CAST(ts AS DATE)`` identically under the UTC session), funnel-step
comparisons are raw timestamp predicates (the fixtures are
microsecond-aligned, same contract as the as-of join oracle), and all
outputs are integer counts.

Scale: retention is two map-side-combinable aggregates and one
cohort-keyed join (shuffles rollup-sized frames, never raw events).
The funnel joins shuffle on user_id; per-step candidate fan-out is
bounded by one user's events inside the funnel window, which is the
same bound ClickHouse's windowFunnel state machine holds per key —
fine as long as per-user event volume is human-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import load_table
from .registry import register

RETENTION_MAX_OFFSET = 7

FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW = "1 hour"


@register(
    "events_retention_cohorts",
    oracle=f"""
WITH cohorts AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT CAST(c.cohort_day AS TIMESTAMP) AS cohort_day,
       CAST(a.day - c.cohort_day AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM activity a JOIN cohorts c ON c.user_id = a.user_id
WHERE a.day - c.cohort_day BETWEEN 0 AND {RETENTION_MAX_OFFSET}
GROUP BY 1, 2""",
    doc="Cohort retention: users bucketed by first-activity day, "
        "counted on each of the next 7 days they return. Two "
        "combinable aggregates (first day per user, distinct "
        "user-days) + one user-keyed join of rollup-sized frames.",
)
def q_events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cohorts = (events.groupBy("user_id")
               .agg(F.min(F.to_date("ts")).alias("cohort_day")))
    activity = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    offset = F.datediff(F.col("day"), F.col("cohort_day"))
    return (activity.join(cohorts, "user_id")
            .filter(offset.between(0, RETENTION_MAX_OFFSET))
            .groupBy(F.col("cohort_day").cast("timestamp").alias("cohort_day"),
                     offset.cast("long").alias("day_offset"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_users")))


@register(
    "events_funnel_depth",
    oracle=f"""
WITH s0 AS (
  SELECT user_id, ts AS t0 FROM events WHERE event_type = '{FUNNEL_STEPS[0]}'
),
s1 AS (
  SELECT a.user_id, a.t0, min(b.ts) AS t1
  FROM s0 a JOIN events b
    ON b.user_id = a.user_id AND b.event_type = '{FUNNEL_STEPS[1]}'
   AND b.ts > a.t0 AND b.ts <= a.t0 + INTERVAL {FUNNEL_WINDOW}
  GROUP BY a.user_id, a.t0
),
s2 AS (
  SELECT a.user_id, a.t0, min(c.ts) AS t2
  FROM s1 a JOIN events c
    ON c.user_id = a.user_id AND c.event_type = '{FUNNEL_STEPS[2]}'
   AND c.ts > a.t1 AND c.ts <= a.t0 + INTERVAL {FUNNEL_WINDOW}
  GROUP BY a.user_id, a.t0
),
per_user AS (
  SELECT u.user_id,
         CASE WHEN max(s2.t2) IS NOT NULL THEN 3
              WHEN max(s1.t1) IS NOT NULL THEN 2
              WHEN max(s0.t0) IS NOT NULL THEN 1
              ELSE 0 END AS funnel_depth
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN s0 ON s0.user_id = u.user_id
  LEFT JOIN s1 ON s1.user_id = u.user_id AND s1.t0 = s0.t0
  LEFT JOIN s2 ON s2.user_id = u.user_id AND s2.t0 = s0.t0
  GROUP BY u.user_id
)
SELECT CAST(funnel_depth AS BIGINT) AS funnel_depth,
       CAST(count(*) AS BIGINT) AS n_users
FROM per_user GROUP BY funnel_depth""",
    doc="windowFunnel equivalent: per user, the deepest "
        "view->click->purchase chain completed within 1 hour of the "
        "view; users histogrammed by depth. Each step is a time-bound "
        "equi-join on user_id + a min() collapse, so fan-out stays "
        "bounded by one user's in-window events (ClickHouse's "
        "windowFunnel state bound).",
)
def q_events_funnel_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    win = F.expr(f"INTERVAL {FUNNEL_WINDOW}")
    s0 = (events.filter(F.col("event_type") == FUNNEL_STEPS[0])
          .select("user_id", F.col("ts").alias("t0")))
    b = (events.filter(F.col("event_type") == FUNNEL_STEPS[1])
         .select(F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")))
    s1 = (s0.join(b, (F.col("b_user") == F.col("user_id"))
                  & (F.col("b_ts") > F.col("t0"))
                  & (F.col("b_ts") <= F.col("t0") + win))
          .groupBy("user_id", "t0").agg(F.min("b_ts").alias("t1")))
    c = (events.filter(F.col("event_type") == FUNNEL_STEPS[2])
         .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")))
    s2 = (s1.join(c, (F.col("c_user") == F.col("user_id"))
                  & (F.col("c_ts") > F.col("t1"))
                  & (F.col("c_ts") <= F.col("t0") + win))
          .groupBy("user_id", "t0").agg(F.min("c_ts").alias("t2")))
    users = events.select("user_id").distinct()
    depth1 = s0.groupBy("user_id").agg(F.lit(1).alias("_d1"))
    depth2 = s1.groupBy("user_id").agg(F.lit(2).alias("_d2"))
    depth3 = s2.groupBy("user_id").agg(F.lit(3).alias("_d3"))
    depth = F.greatest(
        F.coalesce(F.col("_d3"), F.lit(0)),
        F.coalesce(F.col("_d2"), F.lit(0)),
        F.coalesce(F.col("_d1"), F.lit(0)))
    return (users.join(depth1, "user_id", "left")
            .join(depth2, "user_id", "left")
            .join(depth3, "user_id", "left")
            .select(depth.cast("long").alias("funnel_depth"))
            .groupBy("funnel_depth")
            .agg(F.count(F.lit(1)).cast("long").alias("n_users")))


TRANSITIONS_TOP_K = 25


@register(
    "events_top_transitions",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, CAST(n AS BIGINT) AS n
FROM pairs
ORDER BY n DESC, prev_type, next_type
LIMIT {TRANSITIONS_TOP_K}""",
    doc="Per-user event-path transition counts (the Markov-chain "
        "rollup behind sankey/path analysis): lag(event_type) over each "
        "user's timeline, grouped into (prev, next) pair counts, top-25. "
        "The window shuffles once on user_id (per-user state like "
        "ClickHouse's sequence functions); the pair rollup is map-side "
        "combinable; output is TakeOrdered. Tie-broken by (ts, "
        "event_id) so both engines order identically.",
)
def q_events_top_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type"))
    return (
        ordered.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "prev_type", "next_type")
        .limit(TRANSITIONS_TOP_K)
    )
