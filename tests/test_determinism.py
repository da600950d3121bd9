"""Partition-count determinism sweep: queries whose outputs carry
floats must produce BIT-IDENTICAL results when the shuffle layout
changes (7 vs 32 shuffle partitions). The oracle gate tolerates
9-significant-digit float drift; this test demands exact equality —
any hidden parallel float summation (partition-order-dependent) shows
up here even when it happens to pass one oracle run by luck.

The engine's float discipline (COVERAGE.md, NOTES): floats appear only
(a) row-locally from exact integers, (b) in one-shot final expressions
over byte-equal integer aggregates, or (c) in order-pinned sorted-array
folds. All three are layout-independent by construction — this sweep
is the regression net around that claim.
"""

from __future__ import annotations

import math

import pytest

from clickhouse_aggregation_spark.operators import REGISTRY

# every registered query whose result schema includes a float/double
# column plus the iterative/integer-fixed-point flagships (cheap
# insurance that iteration order doesn't leak either)
FLOAT_QUERIES = [
    "events_k_entropy",
    "events_value_k_regression",
    "events_value_quantiles",
    "text_quality_score",
    "pipeline_clean_corpus",
    "embedding_label_centroids",
    "dedup_minhash_lsh",
    "dedup_containment",
    "similarity_ivf_kmeans_refine",
    "orders_brand_basket_lift",
    "events_running_user_stats",
    "transfers_pagerank3",
]


def _canon(rows):
    out = []
    for r in rows:
        vals = []
        for k in sorted(r.asDict()):
            v = r[k]
            if isinstance(v, float):
                # exact bit pattern, not a rounded rendering
                vals.append((k, math.inf if math.isinf(v) else v.hex()
                             if not math.isnan(v) else "nan"))
            else:
                vals.append((k, str(v)))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", FLOAT_QUERIES)
def test_float_outputs_identical_across_shuffle_layouts(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = _canon(REGISTRY[name].fn(spark, sf_dir).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = _canon(REGISTRY[name].fn(spark, sf_dir).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b, f"{name}: result depends on shuffle layout"
    assert len(a) > 0
