"""pipeline_end_to_end: the composed curation funnel (VERDICT r4 #3).
Oracle parity is covered by the parametrized sweep; these pin the
funnel's structural invariants and the plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_aggregation_spark.operators import REGISTRY


def _manifest(spark, sf_dir):
    rows = (REGISTRY["pipeline_end_to_end"].fn(spark, sf_dir)
            .orderBy("stage_id").collect())
    return {r["stage"]: r for r in rows}


def test_funnel_is_monotone_and_complete(spark, sf_dir):
    m = _manifest(spark, sf_dir)
    assert len(m) == 11
    order = ["raw", "exact_dedup", "minhash_dedup", "embedding_dedup",
             "decontam_verbatim", "decontam_neardup", "quality",
             "blocklist", "eval_holdout", "temperature_mix",
             "epoch_shuffle"]
    assert [r for r in m] == order or set(m) == set(order)
    counts = [m[s]["n_docs"] for s in order]
    toks = [m[s]["ws_tokens"] for s in order]
    for a, b in zip(counts, counts[1:]):
        assert b <= a, "a curation stage added documents"
    for a, b in zip(toks, toks[1:]):
        assert b <= a
    # the shuffle permutes, never drops
    assert m["epoch_shuffle"]["n_docs"] == m["temperature_mix"]["n_docs"]
    assert m["epoch_shuffle"]["ws_tokens"] == m["temperature_mix"]["ws_tokens"]
    # permutation checksum is pinned to actual (doc, position) pairs
    assert m["epoch_shuffle"]["checksum"] > 0
    # count-only stage rows carry no checksum
    assert all(m[s]["checksum"] == 0 for s in order[:-1])


def test_funnel_stages_match_standalone_operators(spark, sf_dir):
    """Stage deltas must agree with the standalone operators they
    compose — the composition adds ordering, never new drop logic."""
    from clickhouse_aggregation_spark.operators.dedup import (
        confirmed_minhash_pairs)
    m = _manifest(spark, sf_dir)
    # minhash stage can only drop doc_b's of confirmed pairs that
    # survived stage 1 — so the delta is bounded by the dropped set
    dropped = (confirmed_minhash_pairs(spark, sf_dir)
               .select("doc_b").distinct().count())
    delta = m["exact_dedup"]["n_docs"] - m["minhash_dedup"]["n_docs"]
    assert 0 <= delta <= dropped


def test_funnel_plan_single_cartesian_anchor_only(spark, sf_dir):
    """The funnel composes five drop-set joins + the mix gate: no
    cartesian anywhere except the broadcast 1-row t_min anchor, no
    Python row UDFs."""
    df = REGISTRY["pipeline_end_to_end"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the 1-row t_min anchor appears once per manifest tail branch
    # (temperature_mix row + epoch_shuffle row share the thr lineage)
    bnlj = plan.count("BroadcastNestedLoopJoin")
    assert bnlj <= 2, bnlj
    assert "Cross, isnotnull(FLOOR" in plan or bnlj == 0  # anchor only
    assert "BatchEvalPython" not in plan
