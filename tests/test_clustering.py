"""Connected components vs a pure-Python union-find on the same pairs."""

from __future__ import annotations

from clickhouse_aggregation_spark.operators.clustering import q_dedup_clusters
from clickhouse_aggregation_spark.operators.dedup import q_dedup_minhash_lsh


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    clusters = {}
    for x in list(parent):
        clusters.setdefault(find(x), set()).add(x)
    return {rep: sorted(m) for rep, m in clusters.items() if len(m) > 1}


def test_clusters_match_union_find(spark, sf_oracle_dir):
    pairs = [(r["doc_a"], r["doc_b"]) for r in
             q_dedup_minhash_lsh(spark, sf_oracle_dir).collect()]
    assert pairs, "fixture should contain near-dup pairs"
    want = {rep: (len(m), m[0], m[-1], sum(m))
            for rep, m in _union_find(pairs).items()}
    got = {r["cluster_rep"]: (r["cluster_size"], r["min_member"],
                              r["max_member"], r["member_id_sum"]) for r in
           q_dedup_clusters(spark, sf_oracle_dir).collect()}
    assert got == want
