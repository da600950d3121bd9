from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_aggregation_spark.functions.skew import salted_agg
from clickhouse_aggregation_spark.sources.formats import roundtrip
from clickhouse_aggregation_spark.sources.tables import load_table
from clickhouse_aggregation_spark.sources.transfers import transfers_df


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
def test_format_roundtrip_events(spark, sf_dir, tmp_path, fmt):
    ev = load_table(spark, sf_dir, "events")
    back = roundtrip(ev, str(tmp_path), fmt)
    assert back.schema == ev.schema
    assert back.count() == ev.count()
    a = ev.agg(F.sum("event_id"), F.sum(F.col("value").cast("decimal(18,2)")),
               F.max("ts")).first()
    b = back.agg(F.sum("event_id"), F.sum(F.col("value").cast("decimal(18,2)")),
                 F.max("ts")).first()
    assert tuple(a) == tuple(b)


def test_salted_agg_equals_plain_groupby(spark, sf_dir):
    t = transfers_df(spark, sf_dir)
    plain = t.groupBy("from_address").agg(
        F.sum("value").alias("total"), F.count(F.lit(1)).alias("n"))
    salted = salted_agg(
        t, ["from_address"],
        {"total": F.sum("value"), "n": F.count(F.lit(1))}, n_salt=8)
    diff = plain.exceptAll(salted).count() + salted.exceptAll(plain).count()
    assert diff == 0


def test_approx_distinct_within_rsd_tolerance(spark, sf_oracle_dir):
    """SURVEY.md §5.4: approx_count_distinct vs exact within rsd."""
    t = transfers_df(spark, sf_oracle_dir)
    rsd = 0.05
    row = t.agg(
        F.approx_count_distinct("from_address", rsd).alias("approx"),
        F.countDistinct("from_address").alias("exact")).first()
    assert abs(row["approx"] - row["exact"]) <= max(2, 3 * rsd * row["exact"])


def test_approx_distinct_mean_error_tight(spark, sf_oracle_dir):
    """Secondary non-tail sketch gate (ADVICE r5): the driver's
    approx_uniq_tolerance row bounds the MAX relative error at 4*rsd
    (correct for max-of-1442 estimates, but it tolerates ~33% more
    tail error than 3 sigma). A SYSTEMATIC sketch regression shifts the
    whole error distribution, not just the tail — so pin the MEAN
    relative error over the per-hour buckets: HLL's expected |err| is
    ~ rsd*sqrt(2/pi) ~ 0.8*rsd, and the mean over hundreds of buckets
    concentrates hard; 1.5*rsd is far above any healthy run yet far
    below a mis-parameterized sketch (e.g. rsd accidentally 0.1)."""
    from clickhouse_aggregation_spark.operators.rollups import live

    rsd = 0.05
    lv = live(transfers_df(spark, sf_oracle_dir))
    # daily buckets, not hourly: at the test fixture's scale the hourly
    # buckets hold ~13 distinct senders (HLL sparse mode is near-exact
    # there, so the gate would test nothing); daily buckets carry
    # ~64-142 distinct senders — real estimation territory
    daily = (
        lv.groupBy((F.col("block_number") / 7200).cast("long").alias("d"))
        .agg(F.countDistinct("from_address").alias("exact"),
             F.approx_count_distinct("from_address", rsd).alias("approx"))
        # tiny buckets quantize HLL error to whole counts; the relative
        # error is only meaningful at real cardinalities
        .filter(F.col("exact") >= 50)
    )
    row = daily.agg(
        F.avg(F.abs(F.col("approx") - F.col("exact"))
              / F.col("exact")).alias("mean_rel_err"),
        F.count(F.lit(1)).alias("n")).first()
    assert row["n"] > 0
    assert row["mean_rel_err"] <= 1.5 * rsd, row["mean_rel_err"]
