"""Per-query cost breakdown for the bench headline (guide §1: measure
first). For each query, after one untimed warm-up at the warmup scale
(same discipline as bench.py), reports over the timed scale:

  t_fn     — seconds spent inside spec.fn(spark, sf_dir): Python DAG
             construction plus any eager driver work the operator does
             (getNumPartitions probes, session-index builds, iterative
             loops that run jobs inside fn)
  t_exec   — seconds for the noop write of the returned frame (the
             distributed execution the plan actually costs)
  t_total  — t_fn + t_exec (what bench.py bills as one repeat)
  jobs     — Spark job-count delta across the repeat (scheduling
             round-trips; each job is a driver->cluster barrier)
  exch     — `Exchange` occurrences in the executed plan text
  reps     — both totals, so variance is visible

Usage: python tools/bench_profile.py [SF_DIR] [names...]
Defaults: /root/testdata/sf0.1, the full bench HEADLINE.
Prints one JSON line per query plus a sorted summary to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_aggregation_spark.operators import REGISTRY  # noqa: E402
from clickhouse_aggregation_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
WARMUP_DIR = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
REPS = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "2"))


def main() -> None:
    import bench

    names = sys.argv[2:] or bench.HEADLINE
    spark = get_spark("bench-profile")
    spark.range(1000).selectExpr("sum(id)").collect()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    rows = []
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        if os.path.isdir(WARMUP_DIR):
            spec.fn(spark, WARMUP_DIR).write.format("noop") \
                .mode("overwrite").save()
        recs = []
        jobs = 0
        for rep in range(REPS):
            # per-repeat job group: jobs scheduled by this repeat (fn
            # plus noop execution) land in it, so the count is exact
            # even though job ids are session-global (ADVICE r11: the
            # old jobs0 snapshot was computed and never used)
            group = f"profile-{name}-{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = spec.fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            sc.setJobGroup(None, None)
            jobs = len(tracker.getJobIdsForGroup(group) or [])
            recs.append((t1 - t0, t2 - t1))
        plan = df._jdf.queryExecution().executedPlan().toString()
        rec = {
            "name": name,
            "t_fn": round(min(r[0] for r in recs), 4),
            "t_exec": round(min(r[1] for r in recs), 4),
            "t_total": round(min(r[0] + r[1] for r in recs), 4),
            "totals": [round(r[0] + r[1], 4) for r in recs],
            "jobs": jobs,            # job count of the LAST repeat
            "exch": plan.count("Exchange"),
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    rows.sort(key=lambda r: -r["t_total"])
    print("\n== slowest (t_total / t_fn / t_exec / exch) ==", file=sys.stderr)
    for r in rows[:40]:
        print(f"{r['t_total']:7.3f} {r['t_fn']:7.3f} {r['t_exec']:7.3f} "
              f"{r['exch']:3d}  {r['name']}", file=sys.stderr)
    print(f"TOTAL {sum(r['t_total'] for r in rows):.2f} over {len(rows)}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
