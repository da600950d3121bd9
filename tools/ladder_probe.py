"""Cold-session timing probe for the capped ladder family.

Times, in one fresh session (same order the bench's first run pays):
  1. dedup_neardup_floor_route first run (builds exact baseline +
     12-band ladder frame)
  2. dedup_neardup_ladder_profile first run (the 12->81 grow)
  3. dedup_neardup_ladder_profile second run (steady state)
and prints a checksum of the ladder frame so variants are comparable.

Usage: python tools/ladder_probe.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

root = os.environ.get("SPARK_GRAFT_REPO",
                      str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, root)

from clickhouse_aggregation_spark.operators import REGISTRY  # noqa: E402
from clickhouse_aggregation_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def run(spark, name: str) -> float:
    spec = REGISTRY.get(name)
    t0 = time.perf_counter()
    spec.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("ladder-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for name in ("dedup_neardup_floor_route",
                 "dedup_neardup_ladder_profile",
                 "dedup_neardup_ladder_profile",
                 "dedup_minhash_recall",
                 "dedup_neardup_floor_route_t48",
                 "dedup_ivf_route_recall",
                 "dedup_floor_route_domain_check"):
        dt = run(spark, name)
        print(f"{name}: {dt:.2f}s", flush=True)
    # value checksum of the ladder frame (bit-exactness evidence)
    from pyspark.sql import functions as F
    from clickhouse_aggregation_spark.operators import dedup
    lad = dedup.ladder_capped_pairs(spark, SF_DIR, dedup.EMB_BANDS_MAX)
    row = lad.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash("vec_a", "vec_b", "cosine", "min_band")).alias("h"),
        F.sum("min_band").alias("sb")).first()
    print(f"ladder checksum: n={row.n} h={row.h} sum_band={row.sb}")
    print(f"ladder schema: {lad.schema.simpleString()}")


if __name__ == "__main__":
    main()
