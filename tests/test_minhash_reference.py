"""Pin the MinHash signature family to a pure-Python reference.

Regression guard for a subtle PySpark higher-order-function pitfall:
a two-parameter lambda (e.g. the closure idiom ``lambda s, i=i: ...``)
is bound as transform's (element, index) form, silently capturing the
array-index Column where the loop variable was intended. The resulting
signatures are self-consistent within one plan (so end-to-end dedup
results can still look right) but differ across plans and sessions —
which breaks anything that persists band keys (the streaming LSH
index) and silently diverges from the DuckDB oracle's candidate set.
This test computes the band keys both in Spark and in plain Python
(hashlib) and requires exact equality.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from clickhouse_aggregation_spark.operators.dedup import (
    LSH_BANDS, MINHASH_K, doc_shingle_sets, minhash_band_keys,
)
from clickhouse_aggregation_spark.sources.tables import load_table


def py_band_keys(sh: list[str]) -> list[str]:
    sig = [min(hashlib.md5(f"{i}:{s}".encode()).hexdigest() for s in sh)
           for i in range(MINHASH_K)]
    rows = MINHASH_K // LSH_BANDS
    return [hashlib.md5("|".join(sig[b * rows:(b + 1) * rows]).encode())
            .hexdigest() for b in range(LSH_BANDS)]


def test_band_keys_match_python_reference(spark):
    df = spark.createDataFrame(
        [(1, ["aa bb cc", "bb cc dd", "cc dd ee"], 3),
         (2, ["xx yy zz"], 1)],
        ["doc_id", "sh", "n"])
    got = {(r.doc_id, r.band_id): r.band_key
           for r in minhash_band_keys(df).collect()}
    for doc_id, sh in ((1, ["aa bb cc", "bb cc dd", "cc dd ee"]),
                       (2, ["xx yy zz"])):
        for b, key in enumerate(py_band_keys(sh)):
            assert got[(doc_id, b)] == key, (doc_id, b)


def test_band_keys_on_fixture_docs(spark, sf_dir):
    sets = doc_shingle_sets(load_table(spark, sf_dir, "documents"))
    sample = sets.filter(F.col("doc_id") < 10)
    sh_by_doc = {r.doc_id: list(r.sh) for r in sample.collect()}
    got = {(r.doc_id, r.band_id): r.band_key
           for r in minhash_band_keys(sample).collect()}
    assert sh_by_doc, "fixture docs missing"
    for doc_id, sh in sh_by_doc.items():
        for b, key in enumerate(py_band_keys(sh)):
            assert got[(doc_id, b)] == key, (doc_id, b)


def test_band_keys_stable_across_plans(spark, sf_dir):
    """The same doc must get the same band keys regardless of how the
    plan was built (fresh derivation vs persisted input) — the property
    the streaming LSH index depends on."""
    docs = load_table(spark, sf_dir, "documents")
    fresh = {(r.doc_id, r.band_id): r.band_key
             for r in minhash_band_keys(
                 doc_shingle_sets(docs).filter(F.col("doc_id") < 20)
             ).collect()}
    cached = doc_shingle_sets(docs).filter(F.col("doc_id") < 20).persist()
    try:
        again = {(r.doc_id, r.band_id): r.band_key
                 for r in minhash_band_keys(cached).collect()}
    finally:
        cached.unpersist()
    assert fresh == again


def test_banded_lsh_recall_beats_single_bucket(spark, sf_oracle_dir):
    """The measured motivation for the banded variant: at this corpus's
    dup threshold (cosine 0.45-0.49, per-plane agreement ≈ 0.65) the
    single 8-plane bucket recalls ZERO of the true pairs, while the
    12-band × 5-plane amplification recalls most of them. All inputs
    are seeded/deterministic, so the exact counts are pinned; precision
    is 1 by construction (exact cosine verify of candidates)."""
    from clickhouse_aggregation_spark.operators.dedup import (
        COSINE_BASELINE_CAP, embedding_lsh_banded_pairs,
        embedding_lsh_pairs,
    )
    from clickhouse_aggregation_spark.operators.registry import REGISTRY
    from clickhouse_aggregation_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    sf = sf_oracle_dir
    emb = load_table(spark, sf, "embeddings") \
        .filter(F.col("vec_id") < COSINE_BASELINE_CAP)
    single = {(r.vec_a, r.vec_b) for r in
              embedding_lsh_pairs(emb).collect()}
    banded = {(r.vec_a, r.vec_b) for r in
              embedding_lsh_banded_pairs(emb).collect()}
    truth = {(r.vec_a, r.vec_b) for r in
             REGISTRY["dedup_embedding_cosine"].raw_fn(spark, sf).collect()}
    assert banded <= truth          # precision 1 (exact verify)
    assert single <= truth
    assert len(truth) == 14
    assert len(single) == 0         # the honest zero that motivated banding
    assert len(banded) == 11        # deterministic: seeded planes
