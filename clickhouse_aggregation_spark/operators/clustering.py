"""Iterative operators (beyond-reference): connected components over
the near-duplicate pair graph — the exact cluster assignment that the
greedy keep-lowest-id policy approximates.

Min-label propagation: every doc starts labeled with its own id; each
iteration propagates the minimum label across dup edges; fixpoint =
connected components. Driver-side iteration with localCheckpoint per
round (truncates the growing lineage — the standard Spark pattern for
iterative algorithms; at 100 TB each round is one shuffle join over the
edge list, and real dup graphs converge in a handful of rounds because
component diameters are small).

Oracle-paired: DuckDB expresses the same fixpoint as a recursive CTE
(transitive closure → min reachable label) — quadratic in component
size, fine at oracle scale. Also cross-checked against a pure-Python
union-find on the same pairs (tests/test_clustering.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import load_table
from .dedup import (DOC_SETS_SQL, JACCARD_THRESHOLD, _minhash_sql,
                    q_dedup_minhash_lsh)
from .registry import register

MAX_ITERATIONS = 15


def connected_components(edges: DataFrame, nodes: DataFrame,
                         max_iter: int = MAX_ITERATIONS) -> DataFrame:
    """(node, component) for the undirected graph given by
    edges(doc_a, doc_b); component = min node id reachable."""
    sym = (edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
           .unionByName(
               edges.select(F.col("doc_b").alias("src"),
                            F.col("doc_a").alias("dst")))
           .distinct()
           .localCheckpoint())
    labels = nodes.select(F.col("doc_id").alias("node"),
                          F.col("doc_id").alias("component"))
    for _ in range(max_iter):
        # label(dst) candidate = min over neighbors' labels
        prop = (sym.join(labels, sym.src == labels.node)
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("component").alias("_neighbor_min")))
        new_labels = (
            labels.join(prop, "node", "left")
            .select("node",
                    F.least(F.col("component"),
                            F.coalesce(F.col("_neighbor_min"),
                                       F.col("component"))).alias("component"))
        ).localCheckpoint()
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.component") != F.col("o.component"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            return labels
    # a silent unconverged result would be wrong-but-plausible — the
    # operator's contract is EXACT components, so fail loudly instead
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations "
        f"(component diameter exceeds max_iter); raise max_iter")


@register(
    "dedup_clusters",
    # Spark computes the fixpoint iteratively; DuckDB can express the
    # same fixpoint as a recursive CTE (transitive closure → min
    # reachable label). Closure is |component|² pairs — fine at oracle
    # scale, and exactly why the Spark side iterates instead.
    oracle=f"""
WITH RECURSIVE {DOC_SETS_SQL.strip()},
{_minhash_sql().strip()},
pairs AS (
  SELECT c.doc_a, c.doc_b
  FROM candidates c
  JOIN doc_sets_n a ON a.doc_id = c.doc_a
  JOIN doc_sets_n b ON b.doc_id = c.doc_b
  WHERE len(list_intersect(a.sh, b.sh))
          / (a.n + b.n - len(list_intersect(a.sh, b.sh)))
        >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(origin, reached) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r.origin, e.dst FROM reach r JOIN edges e ON e.src = r.reached
),
labels AS (
  SELECT origin AS node, min(reached) AS component FROM reach GROUP BY origin
)
SELECT component AS cluster_rep,
       CAST(count(*) AS BIGINT) AS cluster_size,
       min(node) AS min_member,
       max(node) AS max_member,
       CAST(sum(node) AS BIGINT) AS member_id_sum
FROM labels
GROUP BY component
HAVING count(*) > 1""",
    doc="Connected components over the MinHash dup-pair graph via "
        "min-label propagation (localCheckpoint per round). Emits "
        "(cluster representative, size, member id range/sum) for "
        "clusters with >1 member — the exact version of the greedy "
        "survivor policy. Scalar digests instead of a member array: "
        "the driver's canonicalizer cannot hash array cells.",
    tags=("iterative",),
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the pair set is already session-persisted (dedup.py
    # confirmed_minhash_pairs) — no private localCheckpoint needed
    pairs = q_dedup_minhash_lsh(spark, sf_dir)
    members = (pairs.select(F.col("doc_a").alias("doc_id"))
               .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
               .distinct())
    labels = connected_components(pairs, members)
    return (
        labels.groupBy(F.col("component").alias("cluster_rep"))
        .agg(F.count(F.lit(1)).alias("cluster_size"),
             F.min("node").alias("min_member"),
             F.max("node").alias("max_member"),
             F.sum("node").alias("member_id_sum"))
        .filter(F.col("cluster_size") > 1)
    )
