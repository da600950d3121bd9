"""As-of join — an operator Spark lacks natively (pyspark guide,
"Common OLAP patterns"), composed from built-in window functions.

Semantics: for each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key (here: each 'purchase'
event gets its user's latest prior-or-simultaneous 'signup'). The
DuckDB oracle uses its native ``ASOF JOIN``, so this doubles as a
cross-engine semantic check of the window composition.

Implementation is the union-timeline trick: tag both sides, sort each
user's timeline once, and carry the last seen right-side timestamp
forward with ``last(..., ignorenulls=True)``. One shuffle on the key,
state bounded per key — no range-explosion, which is why this beats a
range-join at 100 TB (a range join on ts would shuffle |L|x|R|
candidate pairs per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.tables import load_table
from .registry import register


def asof_join_events(left: DataFrame, right: DataFrame,
                     key: str, ts: str) -> DataFrame:
    """Generic keyed as-of: left rows + ``asof_ts`` = greatest right.ts
    <= left.ts (right rows win ties, matching ASOF JOIN >=).

    The left rows travel THROUGH the timeline with all their columns
    (right-side rows pad the extras with null via allowMissingColumns),
    so the result is exactly one output row per left row — a join-back
    on [key, ts] would multiply rows whenever two left rows share a
    timestamp."""
    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(key, ts).withColumn("_side", F.lit(0))
    timeline = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # order right-side rows BEFORE left rows at equal ts (_side asc)
    w = Window.partitionBy(key).orderBy(ts, "_side") \
              .rowsBetween(Window.unboundedPreceding, 0)
    carried = timeline.withColumn(
        "asof_ts",
        F.last(F.when(F.col("_side") == 0, F.col(ts)), ignorenulls=True).over(w))
    return carried.filter(F.col("_side") == 1).drop("_side")


@register(
    "asof_signup_attribution",
    oracle="""
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
signups AS (
  SELECT user_id, ts FROM events WHERE event_type = 'signup'
)
SELECT p.event_id, p.user_id,
       date_trunc('second', p.ts) AS purchase_ts,
       date_trunc('second', s.ts) AS signup_ts,
       CAST(floor(date_part('epoch', p.ts)) AS BIGINT)
         - CAST(floor(date_part('epoch', s.ts)) AS BIGINT) AS gap_seconds
FROM purchases p
ASOF JOIN signups s ON p.user_id = s.user_id AND p.ts >= s.ts""",
    doc="Keyed as-of join: each purchase attributed to the user's most "
        "recent prior signup. Spark side = union-timeline + "
        "last(ignorenulls) window; oracle = DuckDB's native ASOF JOIN.",
)
def q_asof_signup_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase") \
                  .select("event_id", "user_id", "ts")
    signups = ev.filter(F.col("event_type") == "signup") \
                .select("user_id", "ts")
    joined = asof_join_events(purchases, signups, "user_id", "ts")
    return (
        joined.filter(F.col("asof_ts").isNotNull())
        .select(
            "event_id", "user_id",
            F.date_trunc("second", "ts").alias("purchase_ts"),
            F.date_trunc("second", "asof_ts").alias("signup_ts"),
            (F.unix_timestamp("ts") - F.unix_timestamp("asof_ts"))
            .alias("gap_seconds"))
    )
