"""Skew mitigation: salted two-phase aggregation (SURVEY.md §4;
the manual complement to AQE's skew-join splitting).

A hot group key (one address sending most transfers — realistic for
exchanges) concentrates a whole groupBy partition on one task. Salting
splits each key into ``n_salt`` subkeys for the first (heavy) partial
aggregate, then merges the per-salt partials in a second, tiny
aggregate. Algebra requires the measures to be commutative monoids
(sum/count/min/max) — exactly the SummingMergeTree measure family.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(df: DataFrame, keys: list[str], aggs: dict[str, Column],
               n_salt: int = 16,
               merge_fns: dict[str, Callable[[str], Column]] | None = None,
               ) -> DataFrame:
    """Equivalent to ``df.groupBy(keys).agg(**aggs)`` but with the heavy
    shuffle spread over ``n_salt`` subkeys per group.

    ``aggs`` maps output name -> FIRST-phase aggregate column. The
    second phase combines per-salt partials with ``merge_fns[name]``
    (a callable partial-column-name -> merge aggregate), defaulting to
    ``F.sum`` — correct for sum/count. min/max first-phase aggregates
    MUST pass their own merge (e.g. ``{"peak": F.max}``); a count
    partial must NOT be merged with count (that would count salt
    buckets). avg is not salt-mergeable at all — carry sum+count
    partials and divide after the merge.
    """
    merge_fns = merge_fns or {}
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salt).cast("int"))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(name) for name, c in aggs.items()])
    return phase1.groupBy(*keys).agg(
        *[merge_fns.get(name, F.sum)(name).alias(name) for name in aggs])
