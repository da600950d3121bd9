"""Same-session A/B probe for transfers_pagerank3 iteration shapes
(VERDICT r11 next-#3: align the rank frame's partitioning with the
cached edges' so the e⋈r join stops re-exchanging ranks).

Variants (all value-identical by construction — same integer
arithmetic, different physical partitioning only):
  cur    — the shipped shape (nodes persisted unaligned)
  copart — nodes persisted pre-partitioned on `a` at the edges' width,
           so e⋈r and nodes⋈summed reuse existing partitioning
  coshj  — copart + SHUFFLE_HASH hint on the rank side (skips the
           per-iteration sort of both SMJ inputs)

Usage: python tools/pagerank_probe.py [SF_DIR] [REPS]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from clickhouse_aggregation_spark.operators.clustering import (
    PR_D_DEN, PR_D_NUM, PR_ITERS, PR_SCALE)
from clickhouse_aggregation_spark.session import get_spark
from clickhouse_aggregation_spark.sources.transfers import transfers_df

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def build_graph(spark, align_nodes: bool):
    live = transfers_df(spark, SF_DIR).filter(F.col("_sign") == 1)
    edges = (live.groupBy(F.col("from_address").alias("s"),
                          F.col("to_address").alias("t2"))
             .agg(F.count(F.lit(1)).alias("w")))
    outw = edges.groupBy("s").agg(F.sum("w").alias("ow"))
    width = max(spark.sparkContext.defaultParallelism, 4)
    e = (edges.join(outw, "s").repartition(width, F.col("s"))
         .persist(StorageLevel.MEMORY_AND_DISK))
    nodes = (edges.select(F.col("s").alias("a"))
             .unionByName(edges.select(F.col("t2").alias("a")))
             .distinct())
    if align_nodes:
        nodes = nodes.repartition(width, F.col("a"))
    nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
    e.count(); nodes.count()
    return e, nodes


def pagerank(e, nodes, shj: bool):
    ns = nodes.agg(F.count(F.lit(1)).alias("n"))
    base = F.expr(
        f"{(PR_D_DEN - PR_D_NUM) * PR_SCALE}L DIV ({PR_D_DEN} * n)")
    r = (nodes.crossJoin(F.broadcast(ns))
         .select("a", F.expr(f"{PR_SCALE} DIV n").alias("rank")))
    for _ in range(PR_ITERS):
        rj = r.hint("shuffle_hash") if shj else r
        contrib = (e.join(rj, e.s == rj.a)
                   .select(F.col("t2").alias("ca"),
                           F.expr(f"({PR_D_NUM} * rank * w) "
                                  f"DIV ({PR_D_DEN} * ow)").alias("c")))
        summed = contrib.groupBy("ca").agg(F.sum("c").alias("cs"))
        sj = summed.hint("shuffle_hash") if shj else summed
        r = (nodes.crossJoin(F.broadcast(ns))
             .join(sj, nodes.a == sj.ca, "left")
             .select("a", (base + F.coalesce(F.col("cs"), F.lit(0)))
                     .alias("rank")))
    return r.select(F.col("a").alias("address"),
                    F.col("rank").cast("long").alias("rank_scaled"))


def main() -> None:
    spark = get_spark("pagerank-probe")
    spark.range(1000).selectExpr("sum(id)").collect()

    e0, n0 = build_graph(spark, align_nodes=False)
    e1, n1 = build_graph(spark, align_nodes=True)

    variants = {
        "cur": lambda: pagerank(e0, n0, shj=False),
        "copart": lambda: pagerank(e1, n1, shj=False),
        "coshj": lambda: pagerank(e1, n1, shj=True),
    }
    sums = {}
    for name, fn in variants.items():
        df = fn()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # warm
        df.write.format("noop").mode("overwrite").save()
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        row = fn().agg(F.sum("rank_scaled"), F.count(F.lit(1))).first()
        sums[name] = tuple(row)
        print(f"{name:7s} min={min(times):.3f} times={times} "
              f"exch={plan.count('Exchange')} smj={plan.count('SortMergeJoin')} "
              f"shj={plan.count('ShuffledHashJoin')} checksum={tuple(row)}",
              flush=True)
    assert len(set(sums.values())) == 1, f"value mismatch: {sums}"
    print("checksums identical")


if __name__ == "__main__":
    main()
