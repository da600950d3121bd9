"""Distributed exact grouped quantiles — the 100 TB path for the rank
rule ``k = ceil(n*p)`` (min value at/after rank k, tie-order invariant).

A window ``row_number() OVER (PARTITION BY group ORDER BY value)`` is
the obvious implementation, but with low-cardinality groups (5 event
types) every group is ONE reducer sorting its whole slice — the classic
skewed-sort scale-killer. ClickHouse sidesteps it with sketches
(``quantile()``); for the EXACT form this module uses histogram
refinement instead:

  phase 1  n per group                       (map-side-combinable agg)
  phase 2  per-(group, bucket) counts        (map-side-combinable agg)
           + running count over the per-group histogram (window over
           BUCKETS — thousands of rows, not billions)
           -> for each requested rank k: the bucket holding rank k and
              the residual rank k' inside it
  phase 3  re-scan rows of the selected buckets only (~n/buckets rows),
           rank within each (tiny window) and pick rank k'

Three linear scans, every shuffle map-side-combinable, no reducer ever
sees more than one bucket of one group. Returns the exact same element
as the full sort for any bucketing (monotonic floor bucketing preserves
rank order between buckets; within a bucket phase 3 is exact).

The reference's quantile surface is sketch-based
(usdc-transfers/sql/analytics.sql uses uniq()-family approximations);
this exact form is the beyond-reference baseline the sketch is checked
against (see events_value_quantiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# bucket = floor(value * 2^4): ~16 buckets per unit of value range.
# Any monotonic bucketing is correct; granularity only balances the
# phase-3 re-scan size against histogram width.
BUCKET_SCALE = 16


def grouped_exact_quantiles(df: DataFrame, group: str, value: str,
                            pcts: list[int]) -> DataFrame:
    """(group, n, q_<p> for each p in pcts) — exact discrete quantiles
    by integer rank rule k = ceil(n*p/100) = (n*p + 99) DIV 100.

    ``df`` is scanned three times (cheap narrow scans); callers that
    already persist it amortize that.
    """
    bucketed = df.select(
        F.col(group), F.col(value).alias("_v"),
        F.floor(F.col(value) * BUCKET_SCALE).cast("long").alias("_b"))

    # phase 2: per-(group, bucket) histogram + running count; the window
    # runs over histogram rows (|groups| x |buckets|), not data rows
    hist = bucketed.groupBy(group, "_b").agg(F.count(F.lit(1)).alias("_c"))
    wb = (Window.partitionBy(group).orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1))
    wn = Window.partitionBy(group)
    hist = hist.select(
        group, "_b", "_c",
        F.coalesce(F.sum("_c").over(wb), F.lit(0)).alias("_cum_before"),
        F.sum("_c").over(wn).alias("n"))

    # one row per (group, pct): the bucket holding rank k and the
    # residual rank inside it
    pct_rows = F.explode(F.array(*[F.lit(p) for p in pcts])).alias("_pct")
    targets = (
        hist.select(group, "_b", "_c", "_cum_before", "n", pct_rows)
        .withColumn("_k", F.expr("(n * _pct + 99) DIV 100"))
        .filter((F.col("_cum_before") < F.col("_k"))
                & (F.col("_k") <= F.col("_cum_before") + F.col("_c")))
        .select(group, "_pct", "_b", "n",
                (F.col("_k") - F.col("_cum_before")).alias("_k_in"))
    )

    # phase 3: rank ONLY the selected buckets' rows — a ~n/buckets
    # subset, so the per-(group, pct, bucket) window is tiny. The join
    # side is |groups| x |pcts| rows: always broadcastable.
    wsel = Window.partitionBy(group, "_pct", "_b").orderBy("_v")
    picked = (
        bucketed.join(F.broadcast(targets), [group, "_b"])
        .withColumn("_rn", F.row_number().over(wsel))
        .filter(F.col("_rn") == F.col("_k_in"))
        .select(group, "_pct", "n", F.col("_v"))
    )

    agg = [F.max("n").cast("long").alias("n")] + [
        F.max(F.when(F.col("_pct") == p, F.col("_v"))).alias(f"q_{p}")
        for p in pcts
    ]
    return picked.groupBy(group).agg(*agg)
