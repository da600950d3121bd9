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

Round 11: the oracle band-key/cosine primitives were rewritten as
explicit integer sums (dedup._band_key_sql — measured ~4000x on the
key stage), which brings the FULL floor-route oracle (full-corpus
posting self-join + n x K assignment) back inside sane wall-clock at
sf4.0-class scales. The artifact now ATTEMPTS the full three-way
check under a wall-clock budget (ROUTER_FULL_BUDGET_S, default 7200;
DuckDB interrupt on expiry) and only falls back to the documented
waiver record when the budget truly expires — retiring VERDICT r10
next-#4 wherever the box allows.

Usage: python tools/router_artifact.py [SF_DIR] [OUT_JSON]
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.oracle import canon, duckdb_con  # noqa: E402

from clickhouse_aggregation_spark.operators import REGISTRY  # noqa: E402
from clickhouse_aggregation_spark.operators.dedup import (  # noqa: E402
    BAND_PLANES_ALL, _band_key_sql, banded_planes_for)
from clickhouse_aggregation_spark.operators.similarity import (  # noqa: E402
    COSINE_ORACLE_EXPR, int_norm2, quantize)
from clickhouse_aggregation_spark.session import get_spark  # noqa: E402


def staged_routed_count(con, served_bands: int,
                        threshold: float) -> tuple[int, float]:
    """Full-corpus routed-pair COUNT for a banded route, recomputed by
    DuckDB ONE BAND AT A TIME (VERDICT r10 next-#4): each band's
    posting self-join + cosine verify runs as its own INSERT into a
    distinct-pair accumulator, so the peak footprint is one band's
    hash join (n postings) plus the verified-pair accumulator (the
    answer-sized table) — never the monolithic 81-band join that
    spills past this box's disk. A pair posts at most once per band
    (one key per vector per band), and distinct-across-bands is
    exactly the full build's DISTINCT, so the final count equals
    full_c's routed_pairs for the served rung."""
    t0 = time.time()
    n = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    p = banded_planes_for(n)
    con.execute(
        f"""CREATE TEMP TABLE nt AS
            SELECT vec_id, qv, {int_norm2.SQL} AS norm2
            FROM (SELECT vec_id, {quantize.SQL} AS qv FROM embeddings)""")
    con.execute("CREATE TEMP TABLE acc (va BIGINT, vb BIGINT)")
    for band in range(served_bands):
        key = _band_key_sql(BAND_PLANES_ALL[band][:p])
        con.execute(f"""
INSERT INTO acc
SELECT a.vec_id, b.vec_id
FROM (SELECT vec_id, qv, norm2, {key} AS bkey FROM nt) a
JOIN (SELECT vec_id, qv, norm2, {key} AS bkey FROM nt) b
  ON a.bkey = b.bkey AND a.vec_id < b.vec_id
WHERE {COSINE_ORACLE_EXPR} >= {threshold!r}""")
    cnt = con.execute(
        "SELECT count(*) FROM (SELECT DISTINCT va, vb FROM acc)"
    ).fetchone()[0]
    con.execute("DROP TABLE acc; DROP TABLE nt")
    return int(cnt), round(time.time() - t0, 1)

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf4.0"
OUT = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_local_sf4.0_router.json"

def main() -> None:
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


    # a failed step must not lose the completed rows: the artifact is
    # written at the end, and an sf16-class oracle OOM in step 2 threw
    # away step 1's hash-green result before this guard existed
    for name in ("dedup_neardup_ladder_profile",
                 "dedup_floor_route_domain_check"):
        try:
            three_way(name)
        except Exception as e:
            results[name] = {
                "rows_match": None, "schema_match": None,
                "hash_match": None,
                "err": f"{type(e).__name__}: {e}"}

    FULL_BUDGET_S = int(os.environ.get("ROUTER_FULL_BUDGET_S", "7200"))

    spec = REGISTRY["dedup_neardup_floor_route"]
    t0 = time.time()
    spdf = spec.fn(spark, SF).toPandas()
    row = spdf.to_dict("records")[0]
    route_record = {k: (None if v != v else v) if isinstance(v, float)
                    else (int(v) if hasattr(v, "item") else v)
                    for k, v in row.items()}
    # arm the budget interrupt ONLY around the monolithic attempt: a
    # fired timer interrupts whatever duckdb query runs NEXT, so with
    # budget<=0 (explicit skip) no timer must exist at all — the
    # staged-count fallback below runs on the same connection
    timer = threading.Timer(max(FULL_BUDGET_S, 1), con.interrupt)
    try:
        if FULL_BUDGET_S <= 0:   # explicit skip: go straight to staged
            raise RuntimeError("monolithic full oracle skipped (budget 0)")
        timer.start()
        ddf = con.execute(spec.oracle).df()
        results["dedup_neardup_floor_route"] = {
            "rows_match": len(spdf) == len(ddf),
            "schema_match": sorted(spdf.columns) == sorted(ddf.columns),
            "hash_match": canon(spdf) == canon(ddf),
            "spark_rows": len(spdf), "oracle_rows": len(ddf),
            "err": None, "full_oracle": True,
            "route_record": route_record,
            "elapsed_s": round(time.time() - t0, 1),
        }
    except Exception as e:   # interrupted at budget (or oracle OOM/spill)
        # disarm the budget timer BEFORE the staged fallback: a still-
        # pending timer (monolithic died early on its own, e.g. the
        # temp-dir cap) would otherwise interrupt the staged count on
        # the same connection mid-run
        timer.cancel()
        # the monolithic full oracle missed the budget — fall back to the
        # STAGED per-band recomputation of the one number it uniquely
        # covers, the full-corpus routed-pair COUNT (the decision and the
        # pair values are hash-checked above). Bounded footprint: one
        # band's posting join at a time.
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": 1, "oracle_rows": None,
            "monolithic_oracle_err": f"{type(e).__name__}: {e} "
                                     f"(budget {FULL_BUDGET_S}s)",
            "route_record": route_record,
        }
        served = route_record.get("served_bands")
        if os.environ.get("ROUTER_STAGED_COUNT", "1") == "0":
            rec["err"] = ("oracle_infeasible_at_scale: staged count "
                          "skipped by ROUTER_STAGED_COUNT=0 for this "
                          "run; decision and pair values hash-checked "
                          "via dedup_floor_route_domain_check")
        elif served:
            try:
                cnt, cnt_s = staged_routed_count(
                    con, int(served), float(route_record["threshold"]))
                rec["staged_count_oracle"] = cnt
                rec["staged_count_match"] = \
                    cnt == int(route_record["routed_pairs"])
                rec["staged_count_elapsed_s"] = cnt_s
                rec["err"] = None if rec["staged_count_match"] else \
                    "staged_count_mismatch"
            except Exception as e2:
                rec["err"] = ("oracle_infeasible_at_scale: monolithic "
                              "oracle over budget AND staged per-band "
                              f"count failed ({type(e2).__name__}: {e2}); "
                              "decision and pair values remain hash-"
                              "checked via dedup_floor_route_domain_check")
        else:
            rec["err"] = ("oracle_infeasible_at_scale: ivf_cells route — "
                          "staged banded count not applicable; decision "
                          "and pair values hash-checked via "
                          "dedup_floor_route_domain_check")
        results["dedup_neardup_floor_route"] = rec
        results["dedup_neardup_floor_route"]["elapsed_s"] = \
            round(time.time() - t0, 1)
    finally:
        timer.cancel()

    con.close()
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print(json.dumps(results, default=str))


if __name__ == "__main__":
    main()
