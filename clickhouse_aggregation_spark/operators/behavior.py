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


# ---------------------------------------------------------------------------
# sequenceMatch parity: ClickHouse's
# sequenceMatch('(?1).*(?2).*(?3)')(ts, cond1, cond2, cond3) asks, per
# key, whether the condition-bearing steps occur in order anywhere in
# the timeline (no window bound — that is windowFunnel's job, covered
# by events_funnel_depth). Steps here are *qualified* events
# (props.k < 10 — a tenth of the stream), which keeps the answer
# selective and lets the plan pre-filter: only qualified events reach
# the per-user state. Spark side: ONE shuffle on the qualified subset,
# then a per-user sorted-array fold (the same per-key state machine
# ClickHouse runs) — no join chain, no repeated scans. The DuckDB
# oracle uses the classic greedy-equivalence instead: a subsequence
# exists iff each step exists strictly after the *earliest* match of
# the previous step, which is plain min()/EXISTS SQL. Greedy
# earliest-first matching is exact for unbounded subsequence
# existence (NOT for windowed variants), so both formulations agree.
# Determinism: (user_id, ts) is unique in the driver fixtures at every
# SF (verified), so ordering by ts alone is total.

SEQ_STEPS = ("signup", "click", "purchase")
SEQ_K_MAX = 10           # step condition: props.k < 10
_SEQ_K_SQL = "CAST(json_extract_string(props, '$.k') AS BIGINT)"


def _seq_fold(seq_col: str, steps: tuple[str, ...]):
    """Fold a sorted array of (ts, event_id, event_type) structs into
    the deepest prefix of ``steps`` matched in order (greedy)."""
    def step(acc, x):
        out = acc
        for i, s in enumerate(steps):
            out = F.when((acc == i) & (x["event_type"] == s),
                         F.lit(i + 1)).otherwise(out)
        return out
    return F.aggregate(F.col(seq_col), F.lit(0), step)


@register(
    "events_sequence_match",
    oracle=f"""
WITH q AS (
  SELECT user_id, ts, event_type FROM events
  WHERE {_SEQ_K_SQL} < {SEQ_K_MAX}
),
t1 AS (
  SELECT user_id, min(ts) AS ts1 FROM q
  WHERE event_type = '{SEQ_STEPS[0]}' GROUP BY user_id
),
m2 AS (
  SELECT t1.user_id FROM t1
  WHERE EXISTS (SELECT 1 FROM q e
                WHERE e.user_id = t1.user_id
                  AND e.event_type = '{SEQ_STEPS[2]}' AND e.ts > t1.ts1)
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS ts2
  FROM q e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = '{SEQ_STEPS[1]}' AND e.ts > t1.ts1
  GROUP BY e.user_id
),
m3 AS (
  SELECT t2.user_id FROM t2
  WHERE EXISTS (SELECT 1 FROM q e
                WHERE e.user_id = t2.user_id
                  AND e.event_type = '{SEQ_STEPS[2]}' AND e.ts > t2.ts2)
)
SELECT CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT)
         AS n_users,
       CAST((SELECT count(*) FROM m2) AS BIGINT)
         AS n_matched_signup_purchase,
       CAST((SELECT count(*) FROM m3) AS BIGINT)
         AS n_matched_signup_click_purchase""",
    doc="ClickHouse sequenceMatch parity (unbounded ordered-steps "
        "pattern with per-step conditions): per user, do qualified "
        "(props.k < 10) signup .. purchase / signup .. click .. "
        "purchase events occur in timeline order. The step condition "
        "pre-filters before the user shuffle, so per-user state holds "
        "only qualified events; the fold is the ClickHouse state "
        "machine, and the oracle proves it against the greedy "
        "min()/EXISTS formulation (exact for unbounded patterns).",
)
def q_events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    users = events.select("user_id").distinct()
    qual = events.filter(
        F.get_json_object("props", "$.k").cast("long") < SEQ_K_MAX)
    per_user = (qual
                .groupBy("user_id")
                .agg(F.array_sort(F.collect_list(
                    F.struct("ts", "event_id", "event_type"))).alias("seq")))
    two = _seq_fold("seq", (SEQ_STEPS[0], SEQ_STEPS[2]))
    three = _seq_fold("seq", SEQ_STEPS)
    folded = per_user.select(
        "user_id", (two == 2).alias("m2"), (three == 3).alias("m3"))
    return (users.join(folded, "user_id", "left")
            .agg(F.count(F.lit(1)).cast("long").alias("n_users"),
                 F.count(F.when(F.col("m2"), 1)).cast("long")
                  .alias("n_matched_signup_purchase"),
                 F.count(F.when(F.col("m3"), 1)).cast("long")
                  .alias("n_matched_signup_click_purchase")))


# ---------------------------------------------------------------------------
# Audience overlap — ClickHouse groupBitmapAnd/Or/Xor parity (roaring-
# bitmap set algebra over user-id sets) without materializing any set:
# one pass collapses events to per-user membership flags (bool_or per
# event type), and every pairwise intersection/union cardinality falls
# out of ONE combinable count over the flags. The bitmap is an
# encoding; the algebra is what matters, and flags scale linearly
# where an explicit set exchange would move |users| ids per aggregate.


@register(
    "events_audience_overlap",
    oracle="""
WITH f AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p,
         max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS e
  FROM events GROUP BY user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(c) AS BIGINT) AS n_click,
       CAST(sum(p) AS BIGINT) AS n_purchase,
       CAST(sum(e) AS BIGINT) AS n_error,
       CAST(count(CASE WHEN c = 1 AND p = 1 THEN 1 END) AS BIGINT)
         AS click_and_purchase,
       CAST(count(CASE WHEN c = 1 OR p = 1 THEN 1 END) AS BIGINT)
         AS click_or_purchase,
       CAST(count(CASE WHEN c + p = 1 THEN 1 END) AS BIGINT)
         AS click_xor_purchase,
       CAST(count(CASE WHEN c = 1 AND p = 0 THEN 1 END) AS BIGINT)
         AS click_minus_purchase
FROM f""",
    doc="groupBitmapAnd/Or/Xor parity: audience intersection/union/"
        "xor/difference cardinalities between event-type user sets, "
        "via per-user membership flags — two combinable aggregates, "
        "no set materialization, no join. The scalable form of "
        "bitmap set algebra (work ∝ events + users, state ∝ flags).",
)
def q_events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    f = events.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0))
         .alias("c"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
         .alias("p"),
        F.max(F.when(F.col("event_type") == "error", 1).otherwise(0))
         .alias("e"))
    c, p = F.col("c"), F.col("p")
    return f.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("c").cast("long").alias("n_click"),
        F.sum("p").cast("long").alias("n_purchase"),
        F.sum("e").cast("long").alias("n_error"),
        F.count(F.when((c == 1) & (p == 1), 1)).cast("long")
         .alias("click_and_purchase"),
        F.count(F.when((c == 1) | (p == 1), 1)).cast("long")
         .alias("click_or_purchase"),
        F.count(F.when(c + p == 1, 1)).cast("long")
         .alias("click_xor_purchase"),
        F.count(F.when((c == 1) & (p == 0), 1)).cast("long")
         .alias("click_minus_purchase"))


# ---------------------------------------------------------------------------
# sequenceCount parity: the number of NON-OVERLAPPING completed
# view -> click -> purchase matches per user (ClickHouse sequenceCount
# semantics: greedy scan, counter resets after each full match). The
# oracle technique: the greedy automaton is EXACTLY non-overlapping
# leftmost-lazy regex matching — count = len(regexp_extract_all(seq,
# '0.*?1.*?2')) over the concatenated per-user step string. The regex
# engine's contract mirrors the automaton move for move: the leftmost
# match starts at the first step-0 symbol, lazy '.*?' takes the
# earliest step-1 then step-2 after it, and scanning resumes AFTER the
# match end — the automaton's reset. Verified identical to a Python
# fold for every user at sf0.01/sf0.1/sf1.0 (0 mismatches / 16 650
# users). This also makes the gate compare two genuinely independent
# implementations: Spark folds (step, cnt) with a JVM aggregate HOF,
# DuckDB pattern-matches with RE2.
#
# Why not fold in DuckDB too: DuckDB 1.0.0's list_reduce
# DETERMINISTICALLY miscomputes lambdas at full vector width over
# variable-length lists — found by the round-5 full-registry sweeps.
# A struct accumulator folded 3 of 1 500 users wrong at sf0.1 (user
# 342: 7 instead of 9); an integer-packed accumulator still folded 7
# of 15 000 users wrong at sf1.0, errors in both directions. The same
# lambdas evaluated on a filtered single row are correct, the ordered
# input lists are verifiably correct, and the Python reference sides
# with Spark on every user — the bug is batch-level state mixing in
# list_reduce, independent of accumulator shape, so the oracle avoids
# list_reduce entirely.

SEQ_COUNT_STEPS = ("view", "click", "purchase")


@register(
    "events_sequence_count",
    oracle=f"""
WITH q AS (
  SELECT user_id, ts, event_id,
         CASE event_type WHEN '{SEQ_COUNT_STEPS[0]}' THEN 0
                         WHEN '{SEQ_COUNT_STEPS[1]}' THEN 1
                         ELSE 2 END AS pi
  FROM events
  WHERE event_type IN ('{SEQ_COUNT_STEPS[0]}', '{SEQ_COUNT_STEPS[1]}',
                       '{SEQ_COUNT_STEPS[2]}')
),
arr AS (
  SELECT user_id,
         string_agg(CAST(pi AS VARCHAR), '' ORDER BY ts, event_id) AS s
  FROM q GROUP BY user_id
),
folded AS (
  -- greedy automaton == non-overlapping leftmost-lazy regex matches
  SELECT user_id,
         len(regexp_extract_all(s, '0.*?1.*?2')) AS cnt
  FROM arr
),
u AS (SELECT DISTINCT user_id FROM events)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(count(CASE WHEN f.cnt >= 1 THEN 1 END) AS BIGINT)
         AS users_with_match,
       CAST(sum(COALESCE(f.cnt, 0)) AS BIGINT) AS total_matches,
       CAST(max(COALESCE(f.cnt, 0)) AS BIGINT) AS max_matches_per_user
FROM u LEFT JOIN folded f ON f.user_id = u.user_id""",
    doc="ClickHouse sequenceCount parity: non-overlapping completed "
        "view->click->purchase matches per user via a (step, count) "
        "automaton folded over the sorted per-user timeline — one "
        "shuffle on user_id, JVM-side HOF, no join chain. The oracle "
        "counts the SAME matches as non-overlapping leftmost-lazy "
        "regex extraction (provably equivalent to the greedy "
        "automaton; see module comment — DuckDB's list_reduce "
        "miscomputes at vector width, so the fold-vs-regex pairing is "
        "both the workaround and a stronger independence argument).",
)
def q_events_sequence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    users = events.select("user_id").distinct()
    s0, s1, s2 = SEQ_COUNT_STEPS
    qual = events.filter(F.col("event_type").isin(*SEQ_COUNT_STEPS))
    per_user = (qual.groupBy("user_id")
                .agg(F.array_sort(F.collect_list(
                    F.struct("ts", "event_id", "event_type"))).alias("seq")))

    def fold_step(acc, x):
        et = x["event_type"]
        matched = (((acc["step"] == 0) & (et == s0))
                   | ((acc["step"] == 1) & (et == s1))
                   | ((acc["step"] == 2) & (et == s2)))
        nxt = F.when(matched, acc["step"] + 1).otherwise(acc["step"])
        return (F.when(nxt == 3,
                       F.struct(F.lit(0).alias("step"),
                                (acc["cnt"] + 1).alias("cnt")))
                .otherwise(F.struct(nxt.alias("step"),
                                    acc["cnt"].alias("cnt"))))

    init = F.struct(F.lit(0).alias("step"), F.lit(0).alias("cnt"))
    folded = per_user.select(
        "user_id",
        F.aggregate(F.col("seq"), init, fold_step)["cnt"].alias("cnt"))
    return (users.join(folded, "user_id", "left")
            .agg(F.count(F.lit(1)).cast("long").alias("n_users"),
                 F.count(F.when(F.col("cnt") >= 1, 1)).cast("long")
                  .alias("users_with_match"),
                 F.sum(F.coalesce(F.col("cnt"), F.lit(0))).cast("long")
                  .alias("total_matches"),
                 F.max(F.coalesce(F.col("cnt"), F.lit(0))).cast("long")
                  .alias("max_matches_per_user")))
