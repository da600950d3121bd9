"""Prepared-plan memo audit (OPTIMIZATION r12, guide §5 driver work).

For every bench query, measures — with the session indexes WARM (each
fn is called once, untimed, before its audit pass) — whether
re-constructing the finalized frame schedules any Spark job, and how
long pure construction takes (t_fn: Python DAG build + the contract's
schema-driven finalize, which forces Catalyst analysis driver-side).

A query is a prepared-plan (``memo_plan=True``) CANDIDATE iff its warm
construction runs ZERO jobs: such an fn is pure plan preparation, so
memoizing its finalized DataFrame skips only repeated driver-side tree
building/analysis — never any cluster work (the memoized frame
re-executes from parquet on every action). Queries that run jobs at
construction (route decisions, iterative loops, store driving) are
NOT candidates: a memo there would convert per-call work into a cached
result (result caching — gaming, not preparation).

Usage: python tools/memo_audit.py [SF_DIR] [names...]
Prints one JSON line per query and a candidate summary to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_aggregation_spark.operators import REGISTRY  # noqa: E402
from clickhouse_aggregation_spark.operators import registry  # noqa: E402
from clickhouse_aggregation_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "3"))


def main() -> None:
    import bench

    names = sys.argv[2:] or (bench.HEADLINE + bench.BASELINES)
    spark = get_spark("memo-audit")
    spark.range(1000).selectExpr("sum(id)").collect()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    rows = []
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        # warm pass: builds any one-time session index (persisted
        # shingle sets / pair tables / streaming stores); untimed
        spec.fn(spark, SF_DIR)
        t_fns, jobs = [], None
        for rep in range(REPS):
            # evict any memo entry so construction is really re-run
            key = (name, sc.applicationId, SF_DIR)
            registry._PLAN_MEMO.pop(key, None)
            group = f"memo-audit-{name}-{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            spec.fn(spark, SF_DIR)
            t_fns.append(time.perf_counter() - t0)
            sc.setJobGroup(None, None)
            jobs = len(tracker.getJobIdsForGroup(group) or [])
        rec = {"name": name, "t_fn": round(min(t_fns), 4),
               "jobs_at_construction": jobs,
               "memoized": bool(spec.memo_plan)}
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    cands = [r for r in rows
             if r["jobs_at_construction"] == 0 and not r["memoized"]]
    cands.sort(key=lambda r: -r["t_fn"])
    print("\n== zero-job, not yet memoized (t_fn desc) ==", file=sys.stderr)
    for r in cands:
        print(f"{r['t_fn']:7.3f}  {r['name']}", file=sys.stderr)
    print(f"candidate t_fn sum: {sum(r['t_fn'] for r in cands):.2f} "
          f"over {len(cands)}", file=sys.stderr)
    eager = [r["name"] for r in rows if r["jobs_at_construction"]]
    print(f"eager-at-construction ({len(eager)}): {', '.join(eager)}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
