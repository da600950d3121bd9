#!/usr/bin/env python
"""Scale-stress probe: amplify the sf0.1 fixtures in-engine (~100x) and
run the heavy operators, to check the plans that pass correctness also
hold up when the data stops being toy-sized.

Amplification happens lazily (crossJoin with a replica range + key
re-salting) so the probe exercises real shuffle/aggregate volume
without writing a bigger fixture. Usage:

    python tools/scale_probe.py [replicas]

Round-3 numbers at 100 replicas (local[32]): 10.4M transfers — daily
rollup 19.7s, signed retraction 3.7s, LWW window 11.9s; 10M events —
exact quantiles via histogram refinement 2.4s vs 6.5s for the
per-group reducer sort it replaces; 100k docs — minhash candidates
9.7s (4.08M pairs), contamination flags 17.2s (198k pairs on the
dup-heavy amplified corpus); 100k vectors — PQ encode+ADC+re-rank
15.0s, IVF min_by cell assignment 9.4s, sign-LSH embedding near-dup
185s emitting 2.47M verified pairs. That last one deserves its
caveat: the amplified corpus contains 50 EXACT copies of every
vector, so the true near-dup pair count (the output itself) grows
quadratically in the replica factor — the operator's work is ∝
verified collisions by design, and here the collisions are the
answer, not overhead. Real corpora carry percent-level dup density,
not 50x saturation.

Batch-15 re-run (same box): minhash candidates 16.6s (4.08M pairs),
contamination 17.6s (198k flagged), PQ rerank 8.8s, sign-LSH
embedding near-dup 151s (2.47M pairs — the saturation caveat above),
IVF min_by 9.5s, exact quantiles 2.5s vs 5.5s reducer-sort, and the
new Manku simhash stage: 100k docs -> 58,826 distinct codes, 12.8M
three-block super-key candidate pairs in 8.6s. The candidate count
carries the same saturation caveat: 20 near-replicas of every doc
mean most code pairs genuinely are Hamming-close, so candidates
track the (quadratic-by-construction) true answer; at percent-level
dup density candidates shrink proportionally while the 2^-30 random
collision floor stays negligible.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from clickhouse_aggregation_spark.operators.dedup import (
    doc_shingle_sets, minhash_band_keys,
)
from clickhouse_aggregation_spark.session import get_spark
from clickhouse_aggregation_spark.sources.tables import load_table
from clickhouse_aggregation_spark.sources.transfers import transfers_df

SF_DIR = "/root/testdata/sf0.1"
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 100


def amplified_transfers(spark):
    """~10.4M rows at 100 replicas: each replica shifts blocks by a day
    and re-salts addresses, so group-key cardinality scales too."""
    t = transfers_df(spark, SF_DIR)
    reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")
    return (
        t.crossJoin(reps)
        .withColumn("block_number",
                    (F.col("block_number") + F.col("rep") * 7200).cast("int"))
        .withColumn("from_address",
                    F.concat(F.col("from_address"), F.col("rep") % 10))
        .drop("rep")
    )


def timed(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label}: {time.perf_counter() - t0:.2f}s")


def main():
    spark = get_spark("scale-probe")
    big = amplified_transfers(spark)
    n = big.count()
    print(f"amplified transfers rows: {n:,}")

    timed("daily rollup (3-key groupBy)",
          big.filter(F.col("_sign") == 1)
          .groupBy((F.col("block_number").cast("long") / 7200).cast("long")
                   .alias("d"), "from_address", "to_address")
          .agg(F.sum("value"), F.count(F.lit(1))))

    timed("retraction net (signed agg)",
          big.groupBy(F.to_date("block_timestamp").alias("day"))
          .agg(F.sum(F.col("value") * F.col("_sign")),
               F.sum("_sign")))

    timed("LWW dedup window (10M rows)",
          big.withColumn("_rn", F.row_number().over(
              __import__("pyspark").sql.Window
              .partitionBy("block_timestamp", "transaction_hash", "log_index",
                           "from_address")
              .orderBy(F.col("_version").desc())))
          .filter(F.col("_rn") == 1))

    # documents x20 = 100k docs for the minhash candidate pipeline
    docs = load_table(spark, SF_DIR, "documents")
    reps = spark.range(20).withColumnRenamed("id", "rep")
    big_docs = (docs.crossJoin(reps)
                .withColumn("doc_id", F.col("doc_id") * 100 + F.col("rep"))
                .withColumn("text",
                            F.when(F.col("rep") % 4 == 0, F.col("text"))
                            .otherwise(F.concat(F.col("text"), F.lit(" rep"),
                                                F.col("rep"))))
                .drop("rep"))
    # exact quantiles on ~10M rows across 5 groups: the histogram-
    # refinement path vs the naive per-group reducer sort it replaces
    from pyspark.sql import Window

    from clickhouse_aggregation_spark.operators.quantiles import (
        grouped_exact_quantiles,
    )

    # 100 replicas -> 10M rows: histogram 5.0s vs reducer sort 9.3s on
    # local[32]; the gap widens with per-group volume (each of the 5
    # sort reducers owns 1/5 of ALL rows, the refinement path never
    # ranks more than one bucket)
    ev = load_table(spark, SF_DIR, "events")
    reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")
    big_ev = (ev.crossJoin(reps)
              .withColumn("value", F.col("value") + F.col("rep") / 1000.0)
              .drop("rep"))
    n_ev = big_ev.count()
    timed(f"exact quantiles, histogram refinement ({n_ev:,} rows, 5 groups)",
          grouped_exact_quantiles(big_ev, "event_type", "value", [50, 90, 99]))
    w = Window.partitionBy("event_type").orderBy("value")
    wn = Window.partitionBy("event_type")
    timed(f"exact quantiles, per-group reducer sort ({n_ev:,} rows)",
          big_ev.select("event_type", "value",
                        F.row_number().over(w).alias("rn"),
                        F.count(F.lit(1)).over(wn).alias("n"))
          .groupBy("event_type")
          .agg(*[F.min(F.when(
              F.col("rn") >= F.expr(f"(n * {p} + 99) DIV 100"),
              F.col("value"))).alias(f"q{p}") for p in (50, 90, 99)]))

    sets = doc_shingle_sets(big_docs)
    bk = minhash_band_keys(sets)
    t0 = time.perf_counter()
    n_cand = (bk.groupBy("band_id", "band_key")
              .agg(F.count(F.lit(1)).alias("c"))
              .filter(F.col("c") > 1)
              .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2)).first()[0])
    print(f"minhash 100k docs: {time.perf_counter() - t0:.2f}s, "
          f"candidate pairs ~{int(n_cand or 0):,}")

    # contamination at 100k docs: candidate generation must stay an
    # equi-join whose output is ~ actual shared n-grams, and the
    # persisted narrow index must be built once
    from clickhouse_aggregation_spark.operators.contamination import (
        CONTAM_THRESHOLD, doc_shingle_hashes_df,
    )
    sh = doc_shingle_hashes_df(big_docs).persist()
    train = sh.filter(~F.col("is_eval")).select(
        F.col("doc_id").alias("train_doc"), "h")
    ev_side = sh.filter(F.col("is_eval")).select(
        F.col("doc_id").alias("eval_doc"), "h")
    n_eval = ev_side.groupBy("eval_doc").agg(F.count(F.lit(1)).alias("n"))
    t0 = time.perf_counter()
    flagged = (train.join(ev_side, "h")
               .groupBy("train_doc", "eval_doc")
               .agg(F.count(F.lit(1)).alias("common"))
               .join(n_eval, "eval_doc")
               .filter(F.col("common") / F.col("n") >= CONTAM_THRESHOLD)
               .count())
    print(f"contamination 100k docs: {time.perf_counter() - t0:.2f}s, "
          f"flagged pairs {flagged:,}")
    sh.unpersist()

    # PQ over an amplified embedding corpus: encoding is one broadcast
    # join; ADC scoring moves (m, code) ints only
    emb = load_table(spark, SF_DIR, "embeddings")
    reps = spark.range(50).withColumnRenamed("id", "rep")
    big_emb = (emb.crossJoin(reps)
               .withColumn("vec_id", F.col("vec_id") * 100 + F.col("rep"))
               .drop("rep"))
    n_emb = big_emb.count()
    import clickhouse_aggregation_spark.operators.similarity as sim
    import tempfile
    pq_dir = tempfile.mkdtemp(prefix="pq_probe")
    big_emb.write.mode("overwrite").parquet(f"{pq_dir}/embeddings.parquet")
    t0 = time.perf_counter()
    top = sim.q_similarity_pq_rerank(spark, pq_dir)
    top.write.format("noop").mode("overwrite").save()
    print(f"PQ rerank over {n_emb:,} vectors: "
          f"{time.perf_counter() - t0:.2f}s")

    # round-3 paths: sign-LSH embedding near-dup (equi-join on bucket,
    # work ~ in-bucket collisions) and the min_by IVF cell assignment
    # (partial agg collapses the 16x centroid expansion map-side)
    from clickhouse_aggregation_spark.operators.dedup import (
        embedding_lsh_pairs,
    )
    t0 = time.perf_counter()
    n_pairs = embedding_lsh_pairs(big_emb).count()
    print(f"embedding sign-LSH near-dup over {n_emb:,} vectors: "
          f"{time.perf_counter() - t0:.2f}s, pairs {n_pairs:,}")

    t0 = time.perf_counter()
    corpus_cells, _probes = sim._ivf_parts(spark, pq_dir)
    corpus_cells.write.format("noop").mode("overwrite").save()
    print(f"IVF min_by cell assignment over {n_emb:,} vectors: "
          f"{time.perf_counter() - t0:.2f}s")

    # Manku simhash at 100k docs: distinct-code compression first, then
    # the 20 three-block super-keys — candidate volume must track true
    # near-dups (the amplified corpus is dup-heavy on purpose)
    from clickhouse_aggregation_spark.operators.dedup import (
        HAMMING_MAX, simhash60_groups, _BLOCK_TRIPLES, _BLOCK_MASK,
        SIMHASH_BLOCK_BITS,
    )
    t0 = time.perf_counter()
    groups = simhash60_groups(big_docs).persist()
    n_codes = groups.count()
    key_structs = []
    for t, (a, b, c) in enumerate(_BLOCK_TRIPLES):
        kv = None
        for blk in (a, b, c):
            part = F.shiftright(F.col("code"), blk * SIMHASH_BLOCK_BITS) \
                    .bitwiseAND(F.lit(_BLOCK_MASK))
            kv = part if kv is None else \
                F.shiftleft(kv, SIMHASH_BLOCK_BITS) + part
        key_structs.append(F.struct(F.lit(t).alias("t"), kv.alias("kv")))
    posts = groups.select("code", F.explode(F.array(*key_structs)).alias("k")) \
                  .select("code", "k.t", "k.kv")
    n_cand = (posts.groupBy("t", "kv").agg(F.count(F.lit(1)).alias("c"))
              .filter(F.col("c") > 1)
              .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2)).first()[0])
    print(f"simhash hamming<= {HAMMING_MAX} over 100k docs: "
          f"{time.perf_counter() - t0:.2f}s, distinct codes {n_codes:,}, "
          f"super-key candidate pairs ~{int(n_cand or 0):,}")
    groups.unpersist()


if __name__ == "__main__":
    main()
