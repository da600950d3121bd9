"""Spot-check a subset of registry queries against their DuckDB oracles.

The full sweep (tools/correctness_sweep.py) runs the whole declared or
registry set; while iterating on one operator that is too slow a loop.
This runs exactly the named queries with the same canon/hash compare.

Usage:
    python tools/check_queries.py q1,q2,... [SF_DIR]
Defaults: SF_DIR=/root/testdata/sf0.01 (the driver's gated scale).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.oracle import canon, duckdb_con  # noqa: E402

from clickhouse_aggregation_spark.operators import REGISTRY  # noqa: E402
from clickhouse_aggregation_spark.session import get_spark  # noqa: E402


def main() -> int:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark("check-queries")
    con = duckdb_con(sf_dir)
    n_bad = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            spdf = spec.fn(spark, sf_dir).toPandas()
            if spec.oracle is None:
                canon(spdf)
                print(f"  PASS(rows-only) {name}: spark={len(spdf)} "
                      f"[{time.time() - t0:.1f}s]")
                continue
            ddf = con.execute(spec.oracle).df()
            ok = (len(spdf) == len(ddf)
                  and sorted(spdf.columns) == sorted(ddf.columns)
                  and canon(spdf) == canon(ddf))
            n_bad += (not ok)
            print(f"  {'PASS' if ok else 'FAIL'} {name}: "
                  f"spark={len(spdf)} oracle={len(ddf)} "
                  f"[{time.time() - t0:.1f}s]")
            if not ok and len(spdf) == len(ddf):
                cols = sorted(set(spdf.columns) | set(ddf.columns))
                print(f"    spark cols={sorted(spdf.columns)}")
                print(f"    oracle cols={sorted(ddf.columns)}")
                if sorted(spdf.columns) == sorted(ddf.columns):
                    s = spdf.sort_values(list(spdf.columns)).head(5)
                    d = ddf.sort_values(list(ddf.columns))[s.columns].head(5)
                    print("    spark head:\n", s.to_string())
                    print("    oracle head:\n", d.to_string())
        except Exception as e:  # noqa: BLE001
            n_bad += 1
            print(f"  FAIL {name}: {type(e).__name__}: {e}")
    con.close()
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
