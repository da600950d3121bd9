"""grouped_exact_quantiles (distributed histogram refinement) must
return the exact same element as the naive full-sort rank rule — on the
driver tables and on adversarial synthetics (ties, negatives, tiny
groups, bucket-boundary values).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import Window, functions as F

from clickhouse_aggregation_spark.operators.quantiles import (
    grouped_exact_quantiles,
)
from clickhouse_aggregation_spark.sources.tables import load_table

PCTS = [50, 90, 99]


def naive(df, group, value, pcts):
    w = Window.partitionBy(group).orderBy(value)
    wn = Window.partitionBy(group)
    ranked = df.select(group, F.col(value).alias("_v"),
                       F.row_number().over(w).alias("rn"),
                       F.count(F.lit(1)).over(wn).alias("n"))
    aggs = [F.max("n").cast("long").alias("n")] + [
        F.min(F.when(F.col("rn") >= F.expr(f"(n * {p} + 99) DIV 100"),
                     F.col("_v"))).alias(f"q_{p}")
        for p in pcts
    ]
    return ranked.groupBy(group).agg(*aggs)


def assert_same(df, group, value):
    got = {r[group]: r.asDict()
           for r in grouped_exact_quantiles(df, group, value, PCTS).collect()}
    want = {r[group]: r.asDict() for r in naive(df, group, value, PCTS).collect()}
    assert got == want


def test_matches_naive_on_events(spark, sf_dir):
    assert_same(load_table(spark, sf_dir, "events"), "event_type", "value")


_settings = settings(max_examples=10, deadline=None)


@_settings
@given(st.lists(
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=60))
def test_matches_python_rank_rule(spark, values):
    df = spark.createDataFrame([("g", v) for v in values], ["g", "v"])
    row = grouped_exact_quantiles(df, "g", "v", PCTS).collect()[0]
    s = sorted(values)
    n = len(s)
    assert row["n"] == n
    for p in PCTS:
        k = (n * p + 99) // 100
        assert row[f"q_{p}"] == s[k - 1], (p, values)


@pytest.mark.parametrize("values", [
    [0.0],                                  # single row: every q = the row
    [1.0, 1.0, 1.0, 1.0],                   # all ties
    [-5.25, -1.0, 0.0, 0.0625, 0.0625],     # negatives + bucket boundary
    [float(i) / 16 for i in range(100)],    # every value ON a boundary
    [2.0 ** -20] * 7 + [3.5, -3.5],         # one bucket holds most ranks
])
def test_matches_naive_adversarial(spark, values):
    rows = [("a", v) for v in values] + [("b", v + 0.5) for v in values[:3]]
    df = spark.createDataFrame(rows, ["g", "v"])
    assert_same(df, "g", "v")
