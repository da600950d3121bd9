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
