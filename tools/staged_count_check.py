"""Standalone staged routed-pair COUNT check (VERDICT r10 next-#4).

Recomputes the floor router's full-corpus routed-pair count in DuckDB
by the per-band staging of router_artifact.staged_routed_count (one
band's posting self-join at a time into a distinct-pair accumulator —
bounded memory, no monolithic 81-band join) and compares it to the
Spark-recorded route_record inside an existing router artifact. Used
to retire the count waiver at scales where the artifact's other rows
(ladder profile, domain check) are already hash-green, without
re-paying the artifact's multi-minute Spark build: the recorded
routed_pairs IS the Spark number; this recomputation is the
independent engine check of it. On a match the artifact's
floor-route record is updated in place (staged_count_* fields set,
err cleared).

Usage: python tools/staged_count_check.py SF_DIR ARTIFACT_JSON
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.oracle import duckdb_con  # noqa: E402
from tools.router_artifact import staged_routed_count  # noqa: E402

SF = sys.argv[1]
ARTIFACT = sys.argv[2]


def main() -> None:
    with open(ARTIFACT) as f:
        results = json.load(f)
    rec = results["dedup_neardup_floor_route"]
    rr = rec["route_record"]
    if not rr.get("served_bands"):
        raise SystemExit(f"{ARTIFACT}: route {rr.get('route')} is not a "
                         f"banded route — staged count not applicable")
    con = duckdb_con(SF)
    t0 = time.time()
    cnt, cnt_s = staged_routed_count(
        con, int(rr["served_bands"]), float(rr["threshold"]))
    con.close()
    rec["staged_count_oracle"] = cnt
    rec["staged_count_match"] = cnt == int(rr["routed_pairs"])
    rec["staged_count_elapsed_s"] = cnt_s
    if rec["staged_count_match"]:
        rec["err"] = None
    else:
        rec["err"] = "staged_count_mismatch"
    with open(ARTIFACT, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print(json.dumps({
        "sf_dir": SF, "served_bands": rr["served_bands"],
        "spark_routed_pairs": rr["routed_pairs"],
        "staged_count_oracle": cnt,
        "match": rec["staged_count_match"],
        "elapsed_s": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    main()
