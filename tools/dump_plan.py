"""Dump .explain("formatted") for named registry queries to files.

Usage: python tools/dump_plan.py OUT_DIR SUFFIX name1 name2 ...
Writes OUT_DIR/<name>_<SUFFIX>.txt. Uses the same tuned session as
bench.py so the plans match what the bench executes. REPO_ROOT can be
overridden with $SPARK_GRAFT_REPO to dump plans from a different
checkout (used for the before/after pairs in plans/r11/).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

root = os.environ.get("SPARK_GRAFT_REPO",
                      str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, root)

from clickhouse_aggregation_spark.operators import REGISTRY  # noqa: E402
from clickhouse_aggregation_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir, suffix = Path(sys.argv[1]), sys.argv[2]
    names = sys.argv[3:]
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan-dump")
    # SPARK_GRAFT_EXEC_PLAN=1: execute the frame (noop sink) before
    # explaining, so the dump shows the FINAL adaptive plan — required
    # when the claim under audit is runtime partitioning reuse against
    # persisted frames (an AQE-cached InMemoryRelation reports unknown
    # partitioning until materialized, so the initial plan still shows
    # the exchanges the warm run elides). The first fn() call is also
    # what warms session indexes, matching the bench's steady state.
    execute = os.environ.get("SPARK_GRAFT_EXEC_PLAN", "") == "1"
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        df = spec.fn(spark, SF_DIR)
        if execute:
            df.write.format("noop").mode("overwrite").save()
            df = spec.fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(text)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
