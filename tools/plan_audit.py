"""Physical-plan audit over the whole bench headline: one JSON record
per query summarizing the plan properties the engine's scale posture
rests on — shuffle count, join strategies, Python boundaries, scans —
so plan discipline is reviewable at a glance instead of only via the
per-query gates in tests/test_plans.py.

Counted per query (string scan of .explain("formatted") + simple mode):
  exchanges      — `Exchange hashpartitioning` occurrences (shuffles)
  broadcast_joins / sortmerge_joins / shuffled_hash_joins
  cartesian      — CartesianProduct occurrences (expected: 0 outside
                   the documented broadcast 1-row anchors, which show
                   as BroadcastNestedLoopJoin below)
  bnl_joins      — BroadcastNestedLoopJoin (1-row anchor crossJoins)
  row_python     — BatchEvalPython (row-at-a-time UDFs; MUST be 0)
  arrow_python   — ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
                   (vectorized Python — allowed where documented)
  takeordered    — TakeOrderedAndProject (true top-k, no global sort)
  scans          — parquet scan count
  inmemory       — InMemoryTableScan (session-persisted index reads)

Usage: python tools/plan_audit.py [SF_DIR] [OUT_JSON]
Defaults: /root/testdata/sf0.1 -> PLANS_r5.json
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_aggregation_spark.operators import REGISTRY  # noqa: E402
from clickhouse_aggregation_spark.session import get_spark  # noqa: E402

COUNTERS = {
    "exchanges": r"Exchange hashpartitioning",
    "broadcast_joins": r"BroadcastHashJoin",
    "sortmerge_joins": r"SortMergeJoin",
    "shuffled_hash_joins": r"ShuffledHashJoin",
    "cartesian": r"CartesianProduct",
    "bnl_joins": r"BroadcastNestedLoopJoin",
    "row_python": r"BatchEvalPython",
    "arrow_python": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
    "takeordered": r"TakeOrderedAndProject",
    "scans": r"Scan parquet|FileScan parquet",
    "inmemory": r"InMemoryTableScan",
}

# live counters walk the physical-plan TREE via the JVM instead of the
# rendered text. The old text heuristic (skip lines indented deeper
# than an InMemoryRelation) undercounted nothing while caches were
# unexecuted, but once a cached subtree's AQE plan has RUN its
# InMemoryRelation renders `== Final Plan == / == Initial Plan ==`
# sections at reset indentation, escaping the skip — round 6's
# headline "53 live exchanges in pipeline_end_to_end" was the cached
# minhash-pairs build re-rendered several times, not live shuffles
# (the tree walk reports 3). The walk stops naturally at
# InMemoryTableScanExec (the cached plan is not among its children)
# and descends into AdaptiveSparkPlanExec via initialPlan — i.e. the
# counts are EXPLAIN-BEFORE-RUN by design (the audit inspects plans
# without executing them), so they reflect the pre-AQE plan: an upper
# bound on exchanges AQE may later coalesce or convert to broadcast.
# ReusedExchangeExec is likewise not counted (it re-reads a shuffle,
# it does not execute one) — both deliberate, per ADVICE r7.
_LIVE_CLASSES = {
    "ShuffleExchangeExec": "exchanges",
    "CartesianProductExec": "cartesian",
    "BatchEvalPythonExec": "row_python",
    "FileSourceScanExec": "scans",
}


def live_counts(df) -> dict[str, int]:
    out = {v: 0 for v in _LIVE_CLASSES.values()}
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName()
        key = _LIVE_CLASSES.get(name.removesuffix("$"))
        if key is not None:
            out[key] += 1
        if name == "AdaptiveSparkPlanExec":
            stack.append(node.initialPlan())
            continue
        ch = node.children()
        for i in range(ch.length()):
            stack.append(ch.apply(i))
    return {f"live_{k}": v for k, v in out.items()}


def main() -> int:
    import bench

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PLANS_r5.json"
    spark = get_spark("plan-audit")
    out: dict[str, dict] = {}
    for name in bench.HEADLINE:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        try:
            df = spec.fn(spark, sf_dir)
            # simple mode inlines operator arguments (formatted mode
            # splits "Exchange" from its hashpartitioning detail line,
            # which breaks the counters)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "simple")
        except Exception as exc:          # streaming façades raise on
            out[name] = {"err": str(exc)[:200]}   # explain-before-run
            continue
        rec = {k: len(re.findall(p, plan)) for k, p in COUNTERS.items()}
        # "live" view: what a warm run actually executes — cached
        # subtrees (session-persisted indexes) read through
        # InMemoryTableScan, whose one-time build plan is excluded by
        # the tree walk (see live_counts).
        rec.update(live_counts(df))
        out[name] = rec
    summary = {
        "n_queries": len([r for r in out.values() if "err" not in r]),
        "row_python_total": sum(r.get("row_python", 0) for r in out.values()),
        "cartesian_total": sum(r.get("cartesian", 0) for r in out.values()),
        "max_exchanges": max((r.get("exchanges", 0) for r in out.values()),
                             default=0),
        "max_live_exchanges": max(
            (r.get("live_exchanges", 0) for r in out.values()), default=0),
        "live_exchanges_top": sorted(
            ((r.get("live_exchanges", 0), n) for n, r in out.items()),
            reverse=True)[:5],
        "queries_with_arrow_python": sorted(
            n for n, r in out.items() if r.get("arrow_python", 0) > 0),
        "queries_with_bnl": sorted(
            n for n, r in out.items() if r.get("bnl_joins", 0) > 0),
    }
    json.dump({"summary": summary, "queries": out},
              open(out_path, "w"), indent=1)
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
