"""Produce the sf4.0 router-evidence artifact (VERDICT r8 next-#3/#4).

At sf4.0 the floor-route oracles' full-corpus CTEs (full_c: a 54-band
posting self-join over 400k vectors; the IVF corpus assignment: 400k x
~780 centroid distances) are infeasible in DuckDB in sane wall-clock
(the SPARK side of the routed-pair count alone is ~9 min on 32
threads) — so the artifact records, honestly and separately:

* dedup_neardup_ladder_profile: the FULL three-way driver check
  (rows/schema/hash vs its capped-domain DuckDB oracle) — this is the
  hash-green external verification of every rung recall at sf4.0,
  including rung 54's 0.654 >= 0.576 floor;
* dedup_neardup_floor_route: Spark-run route record (route,
  served_bands, rung recalls, routed pair count) with
  err="oracle_infeasible_at_scale" — the route decision itself is
  margin-pinned in tests/test_recall_ledgers.py and its capped-domain
  inputs are exactly the profile rows hash-checked above.

Usage: python tools/sf4_router_artifact.py [SF_DIR] [OUT_JSON]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.oracle import canon, duckdb_con  # noqa: E402

from clickhouse_aggregation_spark.operators import REGISTRY  # noqa: E402
from clickhouse_aggregation_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf4.0"
OUT = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_local_sf4.0_router.json"

spark = get_spark("sf4-router-artifact")
con = duckdb_con(SF)
results: dict[str, dict] = {}

# 1. full three-way check of the ladder profile (capped oracle)
spec = REGISTRY["dedup_neardup_ladder_profile"]
t0 = time.time()
spdf = spec.fn(spark, SF).toPandas()
ddf = con.execute(spec.oracle).df()
results["dedup_neardup_ladder_profile"] = {
    "rows_match": len(spdf) == len(ddf),
    "schema_match": sorted(spdf.columns) == sorted(ddf.columns),
    "hash_match": canon(spdf) == canon(ddf),
    "spark_rows": len(spdf), "oracle_rows": len(ddf),
    "err": None, "elapsed_s": round(time.time() - t0, 1),
}

# 2. Spark-run route record (oracle infeasible at this scale; the
#    decision inputs are the profile rows hash-checked above and the
#    route is margin-pinned in pytest)
spec = REGISTRY["dedup_neardup_floor_route"]
t0 = time.time()
row = spec.fn(spark, SF).toPandas().to_dict("records")[0]
results["dedup_neardup_floor_route"] = {
    "rows_match": None, "schema_match": None, "hash_match": None,
    "spark_rows": 1, "oracle_rows": None,
    "err": "oracle_infeasible_at_scale: full_c (54-band full-corpus "
           "posting self-join over 400k vectors) exceeds sane DuckDB "
           "wall-clock; capped-domain inputs hash-checked via "
           "dedup_neardup_ladder_profile above, route margin-pinned "
           "in tests/test_recall_ledgers.py",
    "route_record": {k: (None if v != v else v) if isinstance(v, float)
                     else (int(v) if hasattr(v, "item") else v)
                     for k, v in row.items()},
    "elapsed_s": round(time.time() - t0, 1),
}

con.close()
with open(OUT, "w") as f:
    json.dump(results, f, indent=2, default=str)
print(json.dumps(results, default=str))
