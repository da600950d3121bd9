"""Probe the near-dup router's decision at one fixture scale.

Prints the full NeardupRoute record (route, served rung, floor,
per-rung recalls, IVF recall, routed pair count) as one JSON line —
the evidence a route pin (tests/test_recall_ledgers.py) is written
from, and the first organic exercise of whichever ladder arm a new
scale lands on (VERDICT r8 next-#3: rung 36 / best-of had only
stub-pinned coverage until a fixture climbs that high for real).

Usage: python tools/router_probe.py [SF_DIR]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf4.0"

from clickhouse_aggregation_spark.operators import dedup  # noqa: E402
from clickhouse_aggregation_spark.session import get_spark  # noqa: E402

spark = get_spark("router-probe")
t0 = time.time()
r = dedup.neardup_candidate_pairs(spark, SF)
route_s = time.time() - t0
n_true = dedup.capped_exact_pairs(spark, SF).count()
t0 = time.time()
n_pairs = r.pairs.count()
print(json.dumps({
    "sf_dir": SF,
    "route": r.route,
    "served_bands": r.served_bands,
    "floor": r.floor,
    "rung_recalls": list(r.rung_recalls),
    "ivf_recall": r.ivf_recall,
    "n_true_capped": n_true,
    "routed_pairs": n_pairs,
    "route_s": round(route_s, 2),
    "pairs_count_s": round(time.time() - t0, 2),
}))
