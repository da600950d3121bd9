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
from ..caches import PlanCache
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
        # carry the convergence bit THROUGH the checkpoint instead of
        # re-joining new vs old labels afterwards (OPTIMIZATION r11:
        # the old per-iteration labels⋈new_labels equality join cost a
        # full extra join + count job per round; a label only ever
        # decreases, so "changed" == "some neighbor_min undercut the
        # old component", computable row-locally before the checkpoint)
        new_labels = (
            labels.join(prop, "node", "left")
            .select("node",
                    F.least(F.col("component"),
                            F.coalesce(F.col("_neighbor_min"),
                                       F.col("component"))).alias("component"),
                    (F.col("_neighbor_min") < F.col("component"))
                    .alias("_changed"))
        ).localCheckpoint()
        # filter-count over the just-materialized checkpoint: no
        # recompute, no shuffle, early-exit limit
        changed = new_labels.filter("_changed").limit(1).count()
        labels = new_labels.drop("_changed")
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


# ---------------------------------------------------------------------------
# PageRank over the transfer graph (beyond-reference graph analytics;
# the weighted-digraph centrality every fraud/flow analysis runs on
# the reference's transfers table). Engine-exactness trick — the same
# one as the k-means refinement: FIXED-POINT INTEGER arithmetic. Ranks
# are scaled to 1e9; every contribution is floor((85 * rank * w) /
# (100 * out_weight)) in int64 (floor division of positives is
# engine-identical), so three unrolled iterations agree with the
# DuckDB oracle bit-for-bit — no float mass anywhere. Dangling nodes
# (receive-only addresses) drop their mass, the standard
# simplification; damping 0.85, teleport base floor(0.15e9 / N).
# The graph stats (N) join back as 1-row broadcasts — no driver-side
# counts in the query path. At 100 TB: each iteration is one
# edges-rank equi-join + one combinable sum, the canonical
# message-passing shape; ranks ride int64 until w * 1e9 nears 2^63
# (switch SCALE or DECIMAL(38,0) then).

PR_SCALE = 10 ** 9
PR_D_NUM, PR_D_DEN = 85, 100       # damping 0.85 as a rational
PR_ITERS = 3

# session-persisted transfer graph, one per (applicationId, sf_dir) —
# the same build-once/join-many contract as the dup-pair tables: every
# unrolled iteration joins the SAME edge table, and without the pin the
# growing lineage re-derives the parquet scan + two groupBys once per
# iteration. Edges are pre-hash-partitioned on the join key (s) at the
# session's shuffle width, so each iteration shuffles only the
# node-sized rank frame. Evicted by caches.clear_plan_caches.
_PR_EDGES_CACHE: dict[tuple[str, str], DataFrame] = PlanCache()
_PR_NODES_CACHE: dict[tuple[str, str], DataFrame] = PlanCache()


def _pr_graph(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    from pyspark import StorageLevel

    from ..sources.transfers import transfers_df
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PR_EDGES_CACHE:
        live = transfers_df(spark, sf_dir).filter(F.col("_sign") == 1)
        edges = (live.groupBy(F.col("from_address").alias("s"),
                              F.col("to_address").alias("t2"))
                 .agg(F.count(F.lit(1)).alias("w")))
        outw = edges.groupBy("s").agg(F.sum("w").alias("ow"))
        width = max(spark.sparkContext.defaultParallelism, 4)
        e = (edges.join(outw, "s")
             .repartition(width, F.col("s"))
             .persist(StorageLevel.MEMORY_AND_DISK))
        _PR_EDGES_CACHE[key] = e
        # OPTIMIZATION r12 (VERDICT r11 next-#3 investigated): the
        # prescribed rank/edge partitioning alignment is ALREADY in
        # the executed plan — nodes' distinct leaves the cached frame
        # hash-partitioned on (a, width) and the per-iteration
        # join-back reuses it (final plan: no Exchange above the nodes
        # scan; plans/r12/transfers_pagerank3_*). An explicit
        # repartition(width, "a") produced a BIT-IDENTICAL physical
        # plan (Catalyst collapses it into the distinct's exchange)
        # and an order-swapped same-session A/B showed no effect
        # (tools/pagerank_probe.py; the first probe's apparent win was
        # build-order warm-up, not partitioning). What WAS real waste:
        # nodes re-derived edges from parquet on its first
        # materialization — deriving from the persisted e frame is
        # value-identical (e is edges⋈outw, an inner join on s that
        # keeps every edge row) and makes the one-time nodes build a
        # scan of the already-cached edges.
        _PR_NODES_CACHE[key] = (
            e.select(F.col("s").alias("a"))
            .unionByName(e.select(F.col("t2").alias("a")))
            .distinct().persist(StorageLevel.MEMORY_AND_DISK))
    return _PR_EDGES_CACHE[key], _PR_NODES_CACHE[key]


def _pagerank_oracle() -> str:
    from ..sources.transfers import TRANSFERS_ORACLE_CTE
    ctes = [f"""
edges AS (
  SELECT from_address AS s, to_address AS t2, count(*) AS w
  FROM transfers WHERE _sign = 1 GROUP BY 1, 2
),
outw AS (SELECT s, sum(w) AS ow FROM edges GROUP BY s),
e AS (SELECT edges.s, edges.t2, edges.w, outw.ow
      FROM edges JOIN outw ON outw.s = edges.s),
nodes AS (
  SELECT DISTINCT a FROM (SELECT s AS a FROM edges
                          UNION ALL SELECT t2 FROM edges)
),
ns AS (SELECT count(*) AS n FROM nodes),
r0 AS (SELECT a, {PR_SCALE} // n AS rank FROM nodes CROSS JOIN ns)"""]
    for i in range(1, PR_ITERS + 1):
        ctes.append(f"""
c{i} AS (
  SELECT e.t2 AS a,
         sum(({PR_D_NUM} * r.rank * e.w) // ({PR_D_DEN} * e.ow)) AS s
  FROM e JOIN r{i-1} r ON r.a = e.s GROUP BY 1
),
r{i} AS (
  SELECT nodes.a,
         {(PR_D_DEN - PR_D_NUM) * PR_SCALE} // ({PR_D_DEN} * n)
           + COALESCE(c{i}.s, 0) AS rank
  FROM nodes CROSS JOIN ns LEFT JOIN c{i} ON c{i}.a = nodes.a
)""")
    return (f"WITH {TRANSFERS_ORACLE_CTE},\n" + ",".join(ctes) +
            f"""
SELECT a AS address, CAST(rank AS BIGINT) AS rank_scaled
FROM r{PR_ITERS}""")


@register(
    "transfers_pagerank3",
    memo_plan=True,   # pure lazy construction (see registry._PLAN_MEMO)
    oracle=_pagerank_oracle(),
    doc="Weighted PageRank (3 unrolled iterations, damping 0.85) over "
        "the live transfer graph in fixed-point int64 — floor-division "
        "contributions make every iteration engine-exact, the same "
        "integer-arithmetic recipe as the k-means refinement. Each "
        "iteration is one edges⋈ranks equi-join + a combinable sum; "
        "graph size N joins back as a 1-row broadcast.",
)
def q_transfers_pagerank3(spark: SparkSession, sf_dir: str) -> DataFrame:
    e, nodes = _pr_graph(spark, sf_dir)
    ns = nodes.agg(F.count(F.lit(1)).alias("n"))
    base = F.expr(
        f"{(PR_D_DEN - PR_D_NUM) * PR_SCALE}L DIV ({PR_D_DEN} * n)")
    r = (nodes.crossJoin(F.broadcast(ns))
         .select("a", F.expr(f"{PR_SCALE} DIV n").alias("rank")))
    for _ in range(PR_ITERS):
        contrib = (e.join(r, e.s == r.a)
                   .select(F.col("t2").alias("ca"),
                           F.expr(f"({PR_D_NUM} * rank * w) "
                                  f"DIV ({PR_D_DEN} * ow)").alias("c")))
        summed = contrib.groupBy("ca").agg(F.sum("c").alias("cs"))
        r = (nodes.crossJoin(F.broadcast(ns))
             .join(summed, nodes.a == summed.ca, "left")
             .select("a", (base + F.coalesce(F.col("cs"), F.lit(0)))
                     .alias("rank")))
    return r.select(F.col("a").alias("address"),
                    F.col("rank").cast("long").alias("rank_scaled"))
