"""The banded-LSH corpus-size knob (VERDICT r4 #2): planes per band
derive from corpus size via the SAME formula on both engines, the
static oracle self-parameterizes from count(*), and the first 5 planes
are bit-identical to the original table so all previously pinned
recall numbers are invariant by construction."""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clickhouse_aggregation_spark.operators.dedup import (
    BAND_PLANES_FULL, BAND_PLANES_TBL, BANDED_MAX_EXTRA, BANDED_N_REF,
    EMB_BAND_PLANES, EMB_BANDS, banded_planes_for, _banded_planes_sql,
)


def test_python_and_sql_plane_formula_agree():
    """Same IEEE double log2/floor on both engines, at the boundary
    values where a float divergence would bite."""
    con = duckdb.connect()
    scalar = _banded_planes_sql().replace(
        "count(*)", "n").replace("FROM embeddings", "FROM t")
    for n in [1, 499, 500, 800, 2000, 4095, 4096, 8191, 8192, 8193,
              10000, 16384, 20000, 65536, 131072, 10**7]:
        con.execute("CREATE OR REPLACE TABLE t AS SELECT ? AS n", [n])
        got_sql = con.execute(f"SELECT {scalar}").fetchone()[0]
        assert got_sql == banded_planes_for(n), n
    con.close()


def test_plane_count_is_clamped_and_monotone():
    assert banded_planes_for(1) == EMB_BAND_PLANES
    assert banded_planes_for(BANDED_N_REF * 2) == EMB_BAND_PLANES + 1
    assert banded_planes_for(10**12) == EMB_BAND_PLANES + BANDED_MAX_EXTRA
    prev = 0
    for n in [100, 5000, 9000, 17000, 33000, 70000, 140000]:
        p = banded_planes_for(n)
        assert p >= prev
        prev = p


def test_extended_table_preserves_original_planes():
    """The extra planes come from a separate seeded stream: band b's
    first 5 planes are bit-identical to the original table, so the
    pinned sf0.01 recall numbers (P(500)=5) cannot move."""
    for b in range(EMB_BANDS):
        assert BAND_PLANES_FULL[b][:EMB_BAND_PLANES] == BAND_PLANES_TBL[b]
        assert len(BAND_PLANES_FULL[b]) == EMB_BAND_PLANES + BANDED_MAX_EXTRA


def _synth_sf_dir(tmp_path, n, dim=64, seed=7):
    """A synthetic embeddings table big enough to exercise P > 5,
    with a few planted near-dup pairs (small perturbations)."""
    rng = np.random.default_rng(seed)
    vecs = rng.uniform(-1.0, 1.0, size=(n, dim)).astype(np.float32)
    # plant 6 near-dups: vec[i+1] = perturbed vec[i]
    for i in range(0, 12, 2):
        vecs[i + 1] = (vecs[i] * 0.9
                       + rng.uniform(-0.1, 0.1, dim)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([i % 4 for i in range(n)], pa.int32()),
    })
    sf = str(tmp_path)
    pq.write_table(tbl, os.path.join(sf, "embeddings.parquet"))
    return sf


@pytest.mark.slow
def test_banded_oracle_parity_with_grown_plane_count(spark, tmp_path):
    """END-TO-END knob check: at n = 9000 (> 2·N_REF) both engines must
    derive P = 6 from the data and produce identical pairs — the
    declared query stays hash-checked at any scale without regenerating
    the oracle."""
    from clickhouse_aggregation_spark.operators.registry import REGISTRY
    from tests.oracle import compare

    n = 9000
    assert banded_planes_for(n) == EMB_BAND_PLANES + 1
    sf = _synth_sf_dir(tmp_path, n)
    spec = REGISTRY["dedup_embedding_lsh_banded"]
    compare(spec.fn(spark, sf), spec.oracle, sf, "banded_knob_p6")


def test_grown_plane_count_prunes_candidates(spark, tmp_path):
    """The knob's point: at the same corpus, P+1 planes must produce
    a strict subset of candidates (prefix keys can only split buckets)
    — candidates shrink, recall can only decrease, linearity is the
    trade. Verified structurally: every P=6 pair is a P=5 pair."""
    from clickhouse_aggregation_spark.operators.dedup import (
        embedding_lsh_banded_pairs)
    from clickhouse_aggregation_spark.sources.tables import load_table

    sf = _synth_sf_dir(tmp_path, 1200)
    emb = load_table(spark, sf, "embeddings")
    p5 = {(r.vec_a, r.vec_b)
          for r in embedding_lsh_banded_pairs(emb, n_corpus=1200).collect()}
    p6 = {(r.vec_a, r.vec_b) for r in embedding_lsh_banded_pairs(
        emb, n_corpus=BANDED_N_REF * 2).collect()}
    assert p6 <= p5


def test_recall_floor_is_threshold_derived():
    """The floor follows the sign-LSH collision model: p = 1 -
    acos(t)/pi, design recall 1-(1-p^P0)^B, floor = 0.75 x design —
    monotone in the threshold, and at t = 0.45 it reproduces (the
    honest value behind) the retired 0.60 constant."""
    from clickhouse_aggregation_spark.operators.dedup import (
        neardup_recall_floor)

    assert neardup_recall_floor(0.45) == 0.576311
    floors = [neardup_recall_floor(t)
              for t in (0.45, 0.48, 0.6, 0.7, 0.9)]
    assert floors == sorted(floors)
    assert all(0 < f < 1 for f in floors)


def test_recall_floor_router_routes_banded_above_floor(spark, sf_oracle_dir):
    """At the gated scale banded recall is 11/14 = 0.786 >= the
    derived 0.576 floor: the router must choose the base 12-band rung,
    return exactly the session-cached confirmed banded pairs, and
    leave every higher rung unmeasured (None — the oracle's NULL)."""
    from clickhouse_aggregation_spark.operators.dedup import (
        confirmed_banded_pairs, neardup_candidate_pairs)

    from clickhouse_aggregation_spark.operators.dedup import BAND_LADDER

    r = neardup_candidate_pairs(spark, sf_oracle_dir)
    assert (r.route, r.served_bands) == ("banded", 12)
    assert r.rung_recalls[0] >= r.floor == 0.576311
    assert r.rung_recalls[1:] == (None,) * (len(BAND_LADDER) - 1)
    assert r.ivf_recall is None
    got = {(p.vec_a, p.vec_b) for p in r.pairs.collect()}
    exp = {(p.vec_a, p.vec_b)
           for p in confirmed_banded_pairs(spark, sf_oracle_dir).collect()}
    assert got == exp


def _stub_recalls(monkeypatch, dedup, fake: dict[int, float]) -> None:
    monkeypatch.setattr(
        dedup, "measured_banded_recall",
        lambda spark, sf_dir, bands=dedup.EMB_BANDS, threshold=0.45:
        fake[bands])


def test_recall_floor_router_climbs_ladder_to_first_adequate_rung(
        spark, sf_oracle_dir, monkeypatch):
    """Below-floor recall must climb the band ladder rung by rung and
    serve the FIRST rung that holds the floor — without measuring past
    it. Measured recalls are stubbed to pin the routing logic at each
    serve point (at the gated scale every rung measures 0.786 so the
    climb can't be hit organically; the scale sweeps exercise it with
    real numbers)."""
    from clickhouse_aggregation_spark.operators import dedup

    for serve_at, expect_route in [(18, "banded_esc"),
                                   (27, "banded_esc27"),
                                   (36, "banded_esc36"),
                                   (54, "banded_esc54"),
                                   (81, "banded_esc81")]:
        fake = {b: (0.70 if b >= serve_at else 0.20)
                for b in dedup.BAND_LADDER}
        _stub_recalls(monkeypatch, dedup, fake)
        r = dedup.neardup_candidate_pairs(spark, sf_oracle_dir)
        assert (r.route, r.served_bands) == (expect_route, serve_at)
        # measured exactly through the serving rung, None after
        idx = dedup.BAND_LADDER.index(serve_at)
        assert all(v is not None for v in r.rung_recalls[:idx + 1])
        assert all(v is None for v in r.rung_recalls[idx + 1:])
        assert r.ivf_recall is None
        got = {(p.vec_a, p.vec_b) for p in r.pairs.collect()}
        exp = {(p.vec_a, p.vec_b)
               for p in dedup.confirmed_banded_pairs(
                   spark, sf_oracle_dir, serve_at).collect()}
        assert got == exp and len(got) > 0


def test_ladder_rungs_only_add_pairs(spark, sf_oracle_dir):
    """Each rung's confirmed pair set must contain every lower rung's
    (rungs only append seeded bands) — the monotonicity the climb's
    early-exit correctness rests on."""
    from clickhouse_aggregation_spark.operators import dedup

    prev: set = set()
    for bands in dedup.BAND_LADDER:
        cur = {(p.vec_a, p.vec_b)
               for p in dedup.capped_banded_pairs(
                   spark, sf_oracle_dir, bands).collect()}
        assert prev <= cur
        prev = cur


def test_ladder_filter_matches_standalone_rung_build(spark, sf_oracle_dir):
    """The session ladder frame's min_band filter must reproduce a
    standalone rung build bit-identically (same pairs, same cosines) —
    the invariant that lets one capped build serve every rung."""
    from pyspark.sql import functions as F
    from clickhouse_aggregation_spark.operators import dedup
    from clickhouse_aggregation_spark.sources.tables import load_table

    emb_full = load_table(spark, sf_oracle_dir, "embeddings")
    n_full = emb_full.count()
    emb = emb_full.filter(F.col("vec_id") < dedup.COSINE_BASELINE_CAP)
    for bands in (12, 18):
        standalone = {(p.vec_a, p.vec_b, p.cosine)
                      for p in dedup.embedding_lsh_banded_pairs(
                          emb, n_corpus=n_full, bands=bands).collect()}
        ladder = {(p.vec_a, p.vec_b, p.cosine)
                  for p in dedup.capped_banded_pairs(
                      spark, sf_oracle_dir, bands).collect()}
        assert ladder == standalone


def test_ladder_incremental_grow_equals_scratch_build(spark, sf_oracle_dir):
    """Growing the session ladder frame rung by rung (12→18→27→36,
    each step materializing only the NEW bands and merging) must be
    bit-identical — pairs, cosines AND min_band — to one from-scratch
    build at the top rung (ADVICE r8 / VERDICT r8 next-#6: the old
    grow rebuilt from scratch; the incremental path is only sound if
    each band's keys are independent of which other bands are built)."""
    from pyspark.sql import functions as F
    from clickhouse_aggregation_spark.operators import dedup
    from clickhouse_aggregation_spark.sources.tables import load_table

    key = (dedup._session_key(spark), sf_oracle_dir)
    old = dedup._LADDER_CAPPED_CACHE.pop(key, None)
    if old is not None:
        dedup._release_ladder(old)
    try:
        for bands in dedup.BAND_LADDER:
            grown = dedup.ladder_capped_pairs(spark, sf_oracle_dir, bands)
        grown_set = {(p.vec_a, p.vec_b, p.cosine, p.min_band)
                     for p in grown.collect()}
    finally:
        cached = dedup._LADDER_CAPPED_CACHE.pop(key, None)
        if cached is not None:
            dedup._release_ladder(cached)
    emb_full = load_table(spark, sf_oracle_dir, "embeddings")
    n_full = emb_full.count()
    emb = emb_full.filter(F.col("vec_id") < dedup.COSINE_BASELINE_CAP)
    scratch = {(p.vec_a, p.vec_b, p.cosine, p.min_band)
               for p in dedup.embedding_lsh_banded_candidates(
                   emb, n_corpus=n_full,
                   bands=dedup.EMB_BANDS_MAX).collect()}
    assert grown_set == scratch and len(scratch) > 0


def test_recall_floor_router_serves_best_when_floor_unreachable(
        spark, sf_oracle_dir, monkeypatch):
    """When no rung holds the floor, the router serves the BEST
    measured generator, not an unconditional fallback (the r7 sf2.0
    ledger showed escalated-banded 0.346 > IVF 0.269 — an always-IVF
    last resort served the worse generator). Floor forced > 1 via the
    fraction; every rung measures 0.786 at the gated scale, IVF 0.286,
    so best-of serves the TOP rung — and it must have MEASURED every
    arm (all rung recalls and ivf_recall not None)."""
    from clickhouse_aggregation_spark.operators import dedup

    monkeypatch.setattr(dedup, "NEARDUP_FLOOR_FRACTION", 1.5)
    r = dedup.neardup_candidate_pairs(spark, sf_oracle_dir)
    assert (r.route, r.served_bands) == ("banded_esc81", 81)
    assert r.floor > 1 >= r.rung_recalls[0]
    assert all(v is not None for v in r.rung_recalls)
    assert r.ivf_recall is not None
    assert r.rung_recalls[-1] > r.ivf_recall
    got = {(p.vec_a, p.vec_b) for p in r.pairs.collect()}
    exp = {(p.vec_a, p.vec_b)
           for p in dedup.confirmed_banded_pairs(
               spark, sf_oracle_dir, dedup.EMB_BANDS_MAX).collect()}
    assert got == exp and len(got) > 0


def test_recall_floor_router_falls_back_to_ivf_when_ivf_wins(
        spark, sf_oracle_dir, monkeypatch):
    """The IVF route is taken exactly when the measured IVF arm beats
    (or ties) the TOP rung below the floor. Rung recalls stubbed under
    the real IVF recall (0.286 at the gated scale) to pin the
    comparison."""
    from clickhouse_aggregation_spark.operators import dedup

    fake = {12: 0.10, 18: 0.15, 27: 0.18, 36: 0.20, 54: 0.22,
            81: 0.24}
    _stub_recalls(monkeypatch, dedup, fake)
    r = dedup.neardup_candidate_pairs(spark, sf_oracle_dir)
    assert (r.route, r.served_bands) == ("ivf_cells", None)
    assert r.rung_recalls == (0.10, 0.15, 0.18, 0.20, 0.22, 0.24)
    assert r.ivf_recall is not None and r.ivf_recall > 0.24
    got = {(p.vec_a, p.vec_b) for p in r.pairs.collect()}
    exp = {(p.vec_a, p.vec_b)
           for p in dedup.ivf_cell_pairs(spark, sf_oracle_dir).collect()}
    assert got == exp and len(got) > 0


def test_router_rejects_thresholds_below_cached_cut():
    """Thresholds under COSINE_DUP_THRESHOLD must raise loudly: the
    cached truth/pair tables are generated at that cut, so pairs in
    [t, 0.45) would be silently invisible to both the truth set and
    every generator (ADVICE r7)."""
    import pytest
    from clickhouse_aggregation_spark.operators import dedup

    for fn in (dedup.neardup_candidate_pairs,
               dedup.measured_banded_recall,
               dedup.measured_ivf_recall):
        with pytest.raises(ValueError, match="threshold"):
            fn(None, "unused", threshold=0.30)


def test_banded_arm_monitor_equals_declared_monitor(spark, sf_oracle_dir):
    """The router's cheap banded-only recall read must equal the
    declared three-arm monitor's banded_recall column exactly."""
    from clickhouse_aggregation_spark.operators.dedup import (
        measured_banded_recall, q_dedup_embedding_lsh_recall)

    full = q_dedup_embedding_lsh_recall(spark, sf_oracle_dir).first()
    assert measured_banded_recall(spark, sf_oracle_dir) \
        == full["banded_recall"]


def test_banded_candidates_reject_degenerate_band_slice(spark):
    """band_lo >= bands must raise, not build phantom bands: the
    empty slice's F.sequence(0, -1) auto-steps DOWN, yielding two
    zero-plane bands whose '' keys collide every row with every other
    (ADVICE r9). The ladder grow path never hits this (it only grows
    when cached width < bands) but the function is public."""
    import pytest
    from clickhouse_aggregation_spark.operators.dedup import (
        embedding_lsh_banded_candidates)

    emb = spark.createDataFrame(
        [(0, [1.0] * 64), (1, [1.0] * 64)],
        "vec_id bigint, embedding array<float>")
    for band_lo, bands in ((12, 12), (13, 12)):
        with pytest.raises(ValueError, match="band_lo"):
            embedding_lsh_banded_candidates(emb, bands=bands,
                                            band_lo=band_lo)
