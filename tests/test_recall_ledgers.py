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
