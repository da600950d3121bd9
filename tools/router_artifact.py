"""Produce a per-fixture router-evidence artifact (generalizes round
9's sf4_router_artifact.py; VERDICT r9 next-#2 adds the sampled-domain
EXACT check of the routed pairs).

At sf4.0+ scales the floor-route oracle's full-corpus CTEs (full_c:
the top-rung posting self-join over the whole corpus; the full n x K
IVF assignment) are infeasible in DuckDB in sane wall-clock. The
artifact therefore records, honestly and separately:

* dedup_neardup_ladder_profile — FULL three-way driver check
  (rows/schema/hash vs its capped-domain DuckDB oracle): every rung
  recall externally verified at this scale;
* dedup_floor_route_domain_check — FULL three-way driver check: the
  route decision (capped-only CTE chain) AND the routed pairs
  themselves, recomputed exactly by DuckDB on the deterministic
  id-sampled domain (vec_id % M == 0). This is the check that retires
  the r9 oracle_infeasible_at_scale waiver: the served generator's
  output now has an independent engine hash at every scale;
* dedup_neardup_floor_route — Spark-run route record (route,
  served_bands, rung recalls, routed FULL-corpus pair count) with
  err="oracle_infeasible_at_scale" for the full-corpus COUNT only;
  the decision and the pair values are covered by the two hash checks
  above, and the route is margin-pinned in tests/test_recall_ledgers.

Usage: python tools/router_artifact.py [SF_DIR] [OUT_JSON]
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

spark = get_spark("router-artifact")
con = duckdb_con(SF)
results: dict[str, dict] = {}


def three_way(name: str) -> None:
    spec = REGISTRY[name]
    t0 = time.time()
    spdf = spec.fn(spark, SF).toPandas()
    ddf = con.execute(spec.oracle).df()
    results[name] = {
        "rows_match": len(spdf) == len(ddf),
        "schema_match": sorted(spdf.columns) == sorted(ddf.columns),
        "hash_match": canon(spdf) == canon(ddf),
        "spark_rows": len(spdf), "oracle_rows": len(ddf),
        "err": None, "elapsed_s": round(time.time() - t0, 1),
    }
    if name == "dedup_floor_route_domain_check":
        results[name]["route_in_output"] = \
            str(spdf["route"].iloc[0]) if len(spdf) else None


three_way("dedup_neardup_ladder_profile")
three_way("dedup_floor_route_domain_check")

spec = REGISTRY["dedup_neardup_floor_route"]
t0 = time.time()
row = spec.fn(spark, SF).toPandas().to_dict("records")[0]
results["dedup_neardup_floor_route"] = {
    "rows_match": None, "schema_match": None, "hash_match": None,
    "spark_rows": 1, "oracle_rows": None,
    "err": "oracle_infeasible_at_scale: full_c (the top-rung "
           "full-corpus posting self-join) exceeds sane DuckDB "
           "wall-clock for the routed-pair COUNT; the route decision "
           "and the routed pair VALUES are hash-checked above via "
           "dedup_floor_route_domain_check, the rung recalls via "
           "dedup_neardup_ladder_profile, and the route is "
           "margin-pinned in tests/test_recall_ledgers.py",
    "route_record": {k: (None if v != v else v) if isinstance(v, float)
                     else (int(v) if hasattr(v, "item") else v)
                     for k, v in row.items()},
    "elapsed_s": round(time.time() - t0, 1),
}

con.close()
with open(OUT, "w") as f:
    json.dump(results, f, indent=2, default=str)
print(json.dumps(results, default=str))
