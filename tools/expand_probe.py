"""Same-session A/B of the countDistinct-Expand rollup shapes
(VERDICT r11 next-#8: the re-agg alternative measured neutral at
sf0.1; decide at sf0.5 where the x3 Expand row blowup dominates).

mv_usdc_hourly_block variants (identical values by construction):
  cur     — one pass, 2 countDistinct -> RewriteDistinctAggregates
            Expand x3 over (hour, from, to)
  reagg   — three passes joined on the 721-row hour key: sums/counts,
            distinct-senders via (hour, from) pre-aggregate, distinct-
            receivers via (hour, to) pre-aggregate
  unpivot — one scan, posexplode to (hour, type, addr) [2 rows/input],
            distinct pair count by (hour, type), pivot back, join sums

approx_uniq_tolerance variants:
  cur     — one pass, 2 countDistinct + 2 approx (Expand x3)
  predis  — two (hour, addr) pre-aggregates; exact = count of distinct
            pairs, approx = approx_count_distinct over the distinct
            values (HLL registers depend only on the value SET, so the
            estimate is bit-identical); joined on hour

Usage: python tools/expand_probe.py [SF_DIR] [REPS]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import Column, functions as F

from clickhouse_aggregation_spark.operators.rollups import (
    block_hour, live)
from clickhouse_aggregation_spark.session import get_spark
from clickhouse_aggregation_spark.sources.transfers import transfers_df

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def hourly_cur(lv):
    return (lv.groupBy(block_hour(F.col("block_number")).alias("block_hour"))
            .agg(F.sum("value").alias("total_volume"),
                 F.count(F.lit(1)).alias("tx_count"),
                 F.countDistinct("from_address").alias("unique_senders"),
                 F.countDistinct("to_address").alias("unique_receivers")))


def hourly_reagg(lv):
    h = block_hour(F.col("block_number")).alias("block_hour")
    base = lv.groupBy(h).agg(F.sum("value").alias("total_volume"),
                             F.count(F.lit(1)).alias("tx_count"))
    s = (lv.select(h, "from_address").distinct()
         .groupBy("block_hour").agg(F.count(F.lit(1)).alias("unique_senders")))
    r = (lv.select(h, "to_address").distinct()
         .groupBy("block_hour").agg(F.count(F.lit(1)).alias("unique_receivers")))
    return base.join(s, "block_hour").join(r, "block_hour")


def hourly_unpivot(lv):
    h = block_hour(F.col("block_number")).alias("block_hour")
    base = lv.groupBy(h).agg(F.sum("value").alias("total_volume"),
                             F.count(F.lit(1)).alias("tx_count"))
    both = lv.select(h, F.posexplode(
        F.array("from_address", "to_address")).alias("t", "addr"))
    d = (both.distinct()
         .groupBy("block_hour")
         .agg(F.sum(F.when(F.col("t") == 0, 1).otherwise(0))
              .alias("unique_senders"),
              F.sum(F.when(F.col("t") == 1, 1).otherwise(0))
              .alias("unique_receivers")))
    return base.join(d, "block_hour")


RSD = 0.05


def _within(approx: Column, exact: Column) -> Column:
    slack = F.greatest(F.lit(4 * RSD) * exact, F.lit(3))
    return (F.abs(approx - exact) <= slack).cast("long")


def tol_cur(lv):
    hourly = (lv.groupBy(block_hour(F.col("block_number")).alias("block_hour"))
              .agg(F.countDistinct("from_address").alias("exact_s"),
                   F.approx_count_distinct("from_address", RSD).alias("approx_s"),
                   F.countDistinct("to_address").alias("exact_r"),
                   F.approx_count_distinct("to_address", RSD).alias("approx_r")))
    return hourly.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(_within(F.col("approx_s"), F.col("exact_s")))
         .alias("senders_within_tol"),
        F.sum(_within(F.col("approx_r"), F.col("exact_r")))
         .alias("receivers_within_tol"))


def tol_predis(lv):
    h = block_hour(F.col("block_number")).alias("block_hour")
    s = (lv.select(h, "from_address").distinct()
         .groupBy("block_hour")
         .agg(F.count(F.lit(1)).alias("exact_s"),
              F.approx_count_distinct("from_address", RSD).alias("approx_s")))
    r = (lv.select(h, "to_address").distinct()
         .groupBy("block_hour")
         .agg(F.count(F.lit(1)).alias("exact_r"),
              F.approx_count_distinct("to_address", RSD).alias("approx_r")))
    hourly = s.join(r, "block_hour")
    return hourly.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(_within(F.col("approx_s"), F.col("exact_s")))
         .alias("senders_within_tol"),
        F.sum(_within(F.col("approx_r"), F.col("exact_r")))
         .alias("receivers_within_tol"))


def main() -> None:
    spark = get_spark("expand-probe")
    spark.range(1000).selectExpr("sum(id)").collect()
    lv = live(transfers_df(spark, SF_DIR))

    groups = {
        "hourly": {"cur": hourly_cur, "reagg": hourly_reagg,
                   "unpivot": hourly_unpivot},
        "tol": {"cur": tol_cur, "predis": tol_predis},
    }
    for gname, variants in groups.items():
        sums = {}
        for vname, fn in variants.items():
            df = fn(lv)
            df.write.format("noop").mode("overwrite").save()   # warm
            times = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(lv).write.format("noop").mode("overwrite").save()
                times.append(round(time.perf_counter() - t0, 3))
            chk = fn(lv).orderBy(*fn(lv).columns[:1]).agg(
                *[F.sum(F.hash(c)).alias(c) for c in fn(lv).columns])
            sums[vname] = tuple(chk.first())
            print(f"{gname}/{vname:8s} min={min(times):.3f} times={times} "
                  f"checksum={sums[vname]}", flush=True)
        assert len(set(sums.values())) == 1, f"{gname} mismatch: {sums}"
        print(f"{gname}: checksums identical", flush=True)


if __name__ == "__main__":
    main()
