"""Local correctness sweep at an arbitrary scale factor (VERDICT r4
#5): run the DECLARED query set on Spark AND its DuckDB oracles over
the same parquet dir, record per-query rows/schema/hash matches in the
driver's CORRECTNESS JSON shape.

The driver only gates at sf0.01; this sweep catches scale-dependent
divergence (overflow, cap interactions, sampling-threshold edges,
parameter-knob derivations) the sf0.01 oracle cannot see.

Usage:
    python tools/correctness_sweep.py [SF_DIR] [OUT_JSON]
Defaults: /root/testdata/sf0.1 -> CORRECTNESS_local_<sfname>.json
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.oracle import canon, duckdb_con  # noqa: E402

from clickhouse_aggregation_spark.operators import REGISTRY  # noqa: E402
from clickhouse_aggregation_spark.operators.registry import (  # noqa: E402
    declared_order, extras_order)
from clickhouse_aggregation_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    out = sys.argv[2] if len(sys.argv) > 2 \
        else f"CORRECTNESS_local_{sf_name}.json"

    spark = get_spark("correctness-sweep")
    con = duckdb_con(sf_dir)
    results: dict[str, dict] = {}
    n_bad = 0
    t0 = time.time()
    # SPARK_GRAFT_SWEEP_ALL=1 sweeps the ENTIRE registry (declared +
    # extras) — the "every oracle-paired query hash-checked at this
    # scale" artifact; default remains the declared driver set.
    names = declared_order()
    if os.environ.get("SPARK_GRAFT_SWEEP_ALL", ""):
        names = names + extras_order()
    for name in names:
        spec = REGISTRY[name]
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        try:
            spdf = spec.fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(spdf)
            if spec.oracle is None:
                # rows-only contract: runs + canonicalizes
                canon(spdf)
                rec.update(rows_match=True, schema_match=True,
                           hash_match=None, oracle_rows=None)
            else:
                ddf = con.execute(spec.oracle).df()
                rec["oracle_rows"] = len(ddf)
                rec["rows_match"] = len(spdf) == len(ddf)
                rec["schema_match"] = \
                    sorted(spdf.columns) == sorted(ddf.columns)
                rec["hash_match"] = canon(spdf) == canon(ddf)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
        results[name] = rec
        good = rec["err"] is None and rec["rows_match"] \
            and rec["schema_match"] and rec["hash_match"] in (True, None)
        n_bad += (not good)
        print(f"  {'PASS' if good else 'FAIL'} {name}: "
              f"spark={rec['spark_rows']} oracle={rec['oracle_rows']}"
              + (f" err={rec['err']}" if rec["err"] else ""))
    con.close()
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"RESULT: {len(results) - n_bad}/{len(results)} green at "
          f"{sf_name} in {time.time() - t0:.0f}s -> {out}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
