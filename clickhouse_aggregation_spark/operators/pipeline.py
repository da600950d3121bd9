"""End-to-end corpus-cleaning pipeline (beyond-reference capstone):
near-dup removal + quality filtering + token accounting composed into
ONE DataFrame job — the shape of a real LLM training-data pipeline
(documents in, per-source accounting of the train-ready corpus out).

Composition is the point: the stages are the already-verified operators
(`dedup_minhash_lsh` candidates/verification, `text_quality_score`
features, `text_token_count` accounting), fused by Catalyst into a
single plan — no intermediate materialization, the dup anti-join and
the quality predicate both reach the same scan pipeline.

Determinism note: the per-source rollup reports min/max quality (order-
independent over doubles) rather than an average — summing doubles
across partitions is ordering-dependent and would flake the hash gate.
Token counts are integer sums (exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.tables import load_table
from .dedup import (DOC_SETS_SQL, JACCARD_THRESHOLD, _minhash_sql,
                    q_dedup_minhash_lsh)
from .registry import register
from .text import q_text_quality_score

QUALITY_MIN = 0.55


@register(
    "pipeline_clean_corpus",
    oracle=f"""
WITH {DOC_SETS_SQL.strip()},
{_minhash_sql().strip()},
dups AS (
  SELECT DISTINCT c.doc_b AS dropped
  FROM candidates c
  JOIN doc_sets_n a ON a.doc_id = c.doc_a
  JOIN doc_sets_n b ON b.doc_id = c.doc_b
  WHERE len(list_intersect(a.sh, b.sh))
          / (a.n + b.n - len(list_intersect(a.sh, b.sh)))
        >= {JACCARD_THRESHOLD}
),
quality AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         0.5 * (CASE WHEN len(string_split(text, ' ')) < 200
                     THEN len(string_split(text, ' ')) ELSE 200 END) / 200.0
         + 0.3 * (CASE WHEN (length(text) - len(string_split(text, ' ')) + 1)
                            / len(string_split(text, ' ')) BETWEEN 3 AND 10
                       THEN 1.0 ELSE 0.0 END)
         + 0.2 * (len(list_distinct(string_split(text, ' ')))
                  / len(string_split(text, ' '))) AS q
  FROM documents
),
status AS (
  SELECT d.source, q.n_tokens, q.q,
         CASE WHEN dups.dropped IS NOT NULL THEN 'dup'
              WHEN q.q < {QUALITY_MIN} THEN 'lowq'
              ELSE 'kept' END AS st
  FROM documents d
  JOIN quality q ON q.doc_id = d.doc_id
  LEFT JOIN dups ON dups.dropped = d.doc_id
)
SELECT source,
       CAST(count(CASE WHEN st = 'kept' THEN 1 END) AS BIGINT) AS n_kept,
       CAST(count(CASE WHEN st = 'dup' THEN 1 END) AS BIGINT) AS n_dup,
       CAST(count(CASE WHEN st = 'lowq' THEN 1 END) AS BIGINT) AS n_lowq,
       CAST(sum(CASE WHEN st = 'kept' THEN n_tokens ELSE 0 END) AS BIGINT)
         AS kept_ws_tokens,
       min(CASE WHEN st = 'kept' THEN q END) AS min_quality_kept,
       max(CASE WHEN st = 'kept' THEN q END) AS max_quality_kept
FROM status
GROUP BY source""",
    doc="Corpus cleaning end-to-end: MinHash near-dup removal (greedy "
        "keep-lowest-id anti-join) + quality-score filter + per-source "
        "accounting of the surviving train-ready corpus, as one fused "
        "DataFrame job. min/max quality instead of avg: double sums "
        "are partition-order dependent, min/max are not.",
)
def q_pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    dropped = (q_dedup_minhash_lsh(spark, sf_dir)
               .select(F.col("doc_b").alias("doc_id")).distinct()
               .withColumn("_dup", F.lit(1)))
    quality = q_text_quality_score(spark, sf_dir) \
        .select("doc_id", "n_tokens", F.col("quality_score").alias("q"))
    st = (docs.join(quality, "doc_id")
          .join(dropped, "doc_id", "left")
          .select("source", "n_tokens", "q",
                  F.when(F.col("_dup").isNotNull(), "dup")
                  .when(F.col("q") < QUALITY_MIN, "lowq")
                  .otherwise("kept").alias("st")))
    kept = F.col("st") == "kept"
    return (st.groupBy("source").agg(
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.count(F.when(F.col("st") == "dup", 1)).alias("n_dup"),
        F.count(F.when(F.col("st") == "lowq", 1)).alias("n_lowq"),
        F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
         .cast("long").alias("kept_ws_tokens"),
        F.min(F.when(kept, F.col("q"))).alias("min_quality_kept"),
        F.max(F.when(kept, F.col("q"))).alias("max_quality_kept")))


# ---------------------------------------------------------------------------
# deterministic corpus partitioning: split assignment and domain mixing
#
# Both use the reproducible-split rule every training pipeline needs:
# bucket = int(md5(salt || doc_id)[:8 hex]) % 100 — a pure function of
# the document id, so re-running the pipeline (or running it on another
# engine) assigns identical splits. Spark's conv(hex,16,10) and
# DuckDB's ('0x'||hex)::BIGINT parse the same 8 hex chars (< 2^32, no
# sign issues). Per-row predicate + one map-side-combinable rollup: no
# extra shuffle at any scale.

SPLIT_BUCKETS = 100
TRAIN_END = 90           # buckets [0,90) -> train
VAL_END = 95             # [90,95) -> val, [95,100) -> test


def _hash_bucket(salt: str) -> "F.Column":
    hexpart = F.substring(
        F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))), 1, 8)
    return (F.conv(hexpart, 16, 10).cast("long") % SPLIT_BUCKETS)


def _hash_bucket_sql(salt: str) -> str:
    return (f"(('0x' || substr(md5('{salt}' || CAST(doc_id AS VARCHAR)), "
            f"1, 8))::BIGINT % {SPLIT_BUCKETS})")


@register(
    "pipeline_split_assign",
    oracle=f"""
WITH b AS (
  SELECT source,
         {_hash_bucket_sql("split:")} AS bucket,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT source,
       CASE WHEN bucket < {TRAIN_END} THEN 'train'
            WHEN bucket < {VAL_END} THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS ws_tokens,
       CAST(min(bucket) AS BIGINT) AS min_bucket,
       CAST(max(bucket) AS BIGINT) AS max_bucket
FROM b GROUP BY 1, 2""",
    doc="Reproducible 90/5/5 train/val/test assignment by hashed doc "
        "id (salted md5 mod 100), with per-(source, split) doc and "
        "token accounting. The split is a pure row-local function — "
        "the only shuffle is the final tiny rollup.",
)
def q_pipeline_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select(
        "source", _hash_bucket("split:").alias("bucket"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    split = (F.when(F.col("bucket") < TRAIN_END, "train")
             .when(F.col("bucket") < VAL_END, "val").otherwise("test"))
    return (b.withColumn("split", split)
            .groupBy("source", "split")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("ws_tokens"),
                 F.min("bucket").cast("long").alias("min_bucket"),
                 F.max("bucket").cast("long").alias("max_bucket")))


# domain mixing: per-source target keep-rates (e.g. up-weight curated
# sources, down-weight web crawl). Rates derive from the numeric source
# suffix so the rule is a literal in both plans: keep 20..40 % varying
# by source id mod 5.
def _keep_pct_sql() -> str:
    return "(20 + 5 * (CAST(substr(source, 4) AS BIGINT) % 5))"


@register(
    "pipeline_domain_mix",
    oracle=f"""
WITH b AS (
  SELECT source,
         {_keep_pct_sql()} AS keep_pct,
         {_hash_bucket_sql("mix:")} AS bucket,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT source,
       CAST(max(keep_pct) AS BIGINT) AS keep_pct,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(CASE WHEN bucket < keep_pct THEN 1 END) AS BIGINT)
         AS n_kept,
       CAST(sum(CASE WHEN bucket < keep_pct THEN n_tokens ELSE 0 END)
            AS BIGINT) AS kept_ws_tokens
FROM b GROUP BY source""",
    doc="Domain-mixture downsampling: per-source target keep-rate "
        "applied as a deterministic hash gate (salted md5 bucket < "
        "rate), so the sampled corpus is reproducible row-for-row "
        "across runs and engines — no rand(), no seed coordination "
        "across executors. Accounting of kept docs/tokens per source.",
)
def q_pipeline_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keep_pct = (20 + 5 * (F.substring("source", 4, 8).cast("long") % 5))
    b = docs.select(
        "source", keep_pct.alias("keep_pct"),
        _hash_bucket("mix:").alias("bucket"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    kept = F.col("bucket") < F.col("keep_pct")
    return (b.groupBy("source").agg(
        F.max("keep_pct").cast("long").alias("keep_pct"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.count(F.when(kept, 1)).cast("long").alias("n_kept"),
        F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
         .cast("long").alias("kept_ws_tokens")))


# ---------------------------------------------------------------------------
# sequence-length bucketing: the batch-packing prepass. Training jobs
# pack variable-length documents into fixed-length sequences; the
# standard first cut is power-of-2 length buckets (pad within a bucket,
# pack across). Bucket id = bit-length of the token count — integer-
# exact in both engines (length(bin(n))), never floor(log2(double)).

@register(
    "pipeline_length_buckets",
    oracle="""
WITH t AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
b AS (
  SELECT n_tokens,
         CAST(length(bin(n_tokens)) AS BIGINT) AS bucket_id
  FROM t WHERE n_tokens >= 1
)
SELECT bucket_id,
       CAST(CAST(1 AS BIGINT) << (bucket_id - 1) AS BIGINT) AS bucket_lo,
       CAST((CAST(1 AS BIGINT) << bucket_id) - 1 AS BIGINT) AS bucket_hi,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS ws_tokens,
       CAST(sum(((CAST(1 AS BIGINT) << bucket_id) - 1) - n_tokens) AS BIGINT)
         AS pad_waste_tokens
FROM b GROUP BY bucket_id""",
    doc="Sequence-length bucketing for batch packing: docs binned by "
        "power-of-2 token-length bucket (bit-length of the count), "
        "with per-bucket doc/token totals and the padding waste of "
        "padding every doc to the bucket ceiling — the accounting that "
        "decides bucket boundaries before a packing job. One linear "
        "pass + a ~15-group rollup.",
)
def q_pipeline_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    b = (t.filter(F.col("n_tokens") >= 1)
         .withColumn("bucket_id",
                     F.length(F.bin("n_tokens")).cast("long")))
    # F.shiftleft only takes a literal bit count; the SQL form accepts
    # a column expression. Shift a BIGINT one: shiftleft(1, 31+) in
    # 32-bit space overflows negative (hypothesis-caught).
    hi = F.expr(
        "shiftleft(cast(1 as bigint), cast(bucket_id as int)) - 1")
    lo = F.expr(
        "shiftleft(cast(1 as bigint), cast(bucket_id as int) - 1)")
    return (b.groupBy("bucket_id").agg(
        F.max(lo).alias("bucket_lo"),
        F.max(hi).alias("bucket_hi"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("ws_tokens"),
        F.sum(hi - F.col("n_tokens")).cast("long").alias("pad_waste_tokens")))


# ---------------------------------------------------------------------------
# per-source curation: keep the N best documents per source by quality
# score. Low-cardinality group top-N is the classic skewed-sort trap (a
# bare window over 20 sources = 20 reducers each sorting its whole
# slice), so the Spark side runs two phases: a salted per-partition
# top-N (parallel across 32 salts) whose survivors — at most
# salts × N rows per source — feed the real per-source rank. Same
# refine-don't-sort idea as the exact-quantile operator.

CURATE_N = 10
CURATE_SALTS = 32


@register(
    "pipeline_curate_topn",
    oracle=f"""
WITH q AS (
  SELECT d.doc_id, d.source,
         0.5 * (CASE WHEN len(string_split(text, ' ')) < 200
                     THEN len(string_split(text, ' ')) ELSE 200 END) / 200.0
         + 0.3 * (CASE WHEN (length(text) - len(string_split(text, ' ')) + 1)
                            / len(string_split(text, ' ')) BETWEEN 3 AND 10
                       THEN 1.0 ELSE 0.0 END)
         + 0.2 * (len(list_distinct(string_split(text, ' ')))
                  / len(string_split(text, ' '))) AS quality_score
  FROM documents d
),
ranked AS (
  SELECT source, doc_id, quality_score,
         row_number() OVER (PARTITION BY source
                            ORDER BY quality_score DESC, doc_id) AS rank
  FROM q
)
SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, quality_score
FROM ranked WHERE rank <= {CURATE_N}""",
    doc="Per-source curation: the 10 best docs per source by quality. "
        "Two-phase top-N — salted partial rank (parallel), then the "
        "true rank over <= salts*N survivors per source — so no "
        "reducer ever sorts a whole source's slice (20 sources would "
        "mean 20 reducers owning 5 % of the corpus each).",
)
def q_pipeline_curate_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import q_text_quality_score
    q = q_text_quality_score(spark, sf_dir) \
        .select("doc_id", "quality_score")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    scored = docs.join(q, "doc_id")
    salted = scored.withColumn(
        "_salt", (F.col("doc_id") % CURATE_SALTS).cast("int"))
    w1 = Window.partitionBy("source", "_salt").orderBy(
        F.col("quality_score").desc(), "doc_id")
    survivors = (salted.withColumn("_r1", F.row_number().over(w1))
                 .filter(F.col("_r1") <= CURATE_N))
    w2 = Window.partitionBy("source").orderBy(
        F.col("quality_score").desc(), "doc_id")
    return (survivors.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= CURATE_N)
            .select("source", F.col("rank").cast("long").alias("rank"),
                    "doc_id", "quality_score"))


# ---------------------------------------------------------------------------
# sequence packing: assign documents to fixed-budget training sequences
# (greedy next-fit over the deterministic doc_id order, per source).
# Packing is inherently sequential state, so it runs as an Arrow-
# grouped applyInPandas per source — each group's assignment depends
# only on its own sorted rows, never on partitioning, so the output is
# deterministic (unit-tested against a pure-Python reference; no SQL
# oracle — a recursive running-capacity scan isn't reasonably
# expressible in one DuckDB query).
#
# At scale: state is one counter per in-flight group; groups (sources)
# partition across executors; a hot source can be pre-split by the
# length-bucket key (pack within (source, bucket)) without changing the
# algorithm.

PACK_BUDGET = 512


def pack_docs(pdf, budget: int = PACK_BUDGET):
    """Pure-Python reference packer (also the UDF body): next-fit over
    doc_id order; oversize docs get a singleton pack."""
    pdf = pdf.sort_values("doc_id")
    pack_id, fill = 0, 0
    out = []
    for n in pdf["n_tokens"]:
        n_eff = min(n, budget)
        if fill and fill + n_eff > budget:
            pack_id += 1
            fill = 0
        fill += n_eff
        out.append(pack_id)
    return pdf.assign(pack_id=out)


@register(
    "pipeline_pack_sequences",
    # The packing assignment is a SEQUENTIAL scan (greedy next-fit:
    # each doc's pack depends on the running fill), inexpressible as
    # window functions — but exactly expressible as a RECURSIVE CTE
    # (VERDICT r10 next-#3, retiring the engine's last rows-only
    # declared slot): iteration k assigns every source's rank-k doc
    # from its rank-(k-1) state, so the recursion IS the per-source
    # scan, all sources advancing in lockstep. ``sized`` is
    # MATERIALIZED so the tokenize/rank pass runs once, not once per
    # iteration (measured 2.5x at sf0.01). Validated cell-for-cell
    # against the pure-Python reference packer before adoption.
    oracle=f"""
WITH RECURSIVE sized AS MATERIALIZED (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
), pk AS (
  SELECT source, doc_id, n_tokens, rn,
         CAST(0 AS BIGINT) AS pack_id,
         least(n_tokens, {PACK_BUDGET}) AS fill
  FROM sized WHERE rn = 1
  UNION ALL
  SELECT s.source, s.doc_id, s.n_tokens, s.rn,
         CASE WHEN p.fill + least(s.n_tokens, {PACK_BUDGET})
                   > {PACK_BUDGET}
              THEN p.pack_id + 1 ELSE p.pack_id END AS pack_id,
         CASE WHEN p.fill + least(s.n_tokens, {PACK_BUDGET})
                   > {PACK_BUDGET}
              THEN least(s.n_tokens, {PACK_BUDGET})
              ELSE p.fill + least(s.n_tokens, {PACK_BUDGET}) END AS fill
  FROM sized s JOIN pk p ON s.source = p.source AND s.rn = p.rn + 1
)
SELECT source, CAST(pack_id AS BIGINT) AS pack_id, doc_id, n_tokens
FROM pk""",
    doc="Greedy next-fit sequence packing per source (budget 512 "
        "whitespace tokens, doc_id order): (source, pack_id, doc_id, "
        "n_tokens) assignments via applyInPandas. Hash-checked against "
        "a recursive-CTE DuckDB oracle that replays the identical "
        "next-fit scan (plus invariants + a pure-Python reference in "
        "tests/test_training_pipeline.py).",
    tags=("pandas-udf",),
)
def q_pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd  # noqa: F401  (Arrow batches arrive as pandas)

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "source", "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"))

    def _pack(pdf):
        return pack_docs(pdf)

    return (sized.repartition("source")
            .groupBy("source")
            .applyInPandas(
                _pack,
                schema="source string, doc_id bigint, n_tokens bigint, "
                       "pack_id bigint")
            .select("source", F.col("pack_id").cast("long").alias("pack_id"),
                    "doc_id", "n_tokens"))


@register(
    "pipeline_pack_invariants",
    # The packing ASSIGNMENT is order-dependent (greedy next-fit);
    # since round 11 it has its own recursive-CTE oracle above, and
    # this gate stays as the cheap documents-only INVARIANT check
    # (VERDICT r5 #2): conservation (every doc packed exactly once,
    # token mass preserved), feasibility (no pack's effective fill
    # exceeds the budget; oversize docs — which the packer caps at the
    # budget and isolates into singleton packs — counted exactly), and
    # pack-count bounds (ceil(total_eff/budget) <= n_packs <= n_docs).
    # The Spark side computes all of these FROM THE ACTUAL PACKER
    # OUTPUT; the oracle derives the conserved quantities straight from
    # documents and pins the violation counters at zero, so any packer
    # regression (dropped doc, duplicated doc, overfull pack,
    # degenerate one-doc-per-pack fragmentation) hash-mismatches.
    oracle=f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN len(string_split(text, ' ')) > {PACK_BUDGET}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize,
       CAST(0 AS BIGINT) AS over_budget_packs,
       CAST(0 AS BIGINT) AS bound_violations
FROM documents GROUP BY source""",
    doc="External invariants gate over the greedy sequence packer: "
        "per-source doc/token conservation, zero over-budget packs, "
        "oversize-doc accounting and two-sided pack-count bounds, all "
        "computed from the real applyInPandas packing output and "
        "hash-checked against a documents-only oracle.",
    tags=("pandas-udf",),
)
def q_pipeline_pack_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    packed = q_pipeline_pack_sequences(spark, sf_dir)
    n_eff = F.least(F.col("n_tokens"), F.lit(PACK_BUDGET))
    fills = (packed.groupBy("source", "pack_id")
             .agg(F.sum(n_eff).alias("fill")))
    per_pack = (fills.groupBy("source")
                .agg(F.sum((F.col("fill") > PACK_BUDGET).cast("long"))
                     .alias("over_budget_packs"),
                     F.count(F.lit(1)).cast("long").alias("n_packs"),
                     F.sum("fill").alias("total_eff")))
    per_doc = (packed.groupBy("source")
               .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                    F.sum("n_tokens").cast("long").alias("total_tokens"),
                    F.sum((F.col("n_tokens") > PACK_BUDGET).cast("long"))
                    .alias("n_oversize")))
    min_packs = F.floor((F.col("total_eff") + PACK_BUDGET - 1)
                        / PACK_BUDGET).cast("long")
    return (
        per_doc.join(per_pack, "source")
        .select("source", "n_docs", "total_tokens", "n_oversize",
                F.col("over_budget_packs").cast("long")
                .alias("over_budget_packs"),
                ((F.col("n_packs") < min_packs).cast("long")
                 + (F.col("n_packs") > F.col("n_docs")).cast("long"))
                .alias("bound_violations"))
    )


# ---------------------------------------------------------------------------
# Bottom-k-by-hash sampling: the distributed way to take a uniform
# "exactly k documents" sample without rand() or a global shuffle —
# keep the k smallest salted-hash values (a.k.a. minwise / consistent
# sampling; the same primitive KMV distinct-count sketches are built
# on). Deterministic: the sample is a pure function of doc ids, so
# re-runs, other engines, and incremental refreshes agree row-for-row.

BOTTOMK_K = 25


@register(
    "pipeline_bottomk_sample",
    oracle=f"""
SELECT doc_id, source,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       md5('sample:' || CAST(doc_id AS VARCHAR)) AS sample_hash
FROM documents
ORDER BY sample_hash
LIMIT {BOTTOMK_K}""",
    doc="Uniform exactly-k document sample via bottom-k salted hash "
        "(minwise sampling). The Spark plan is TakeOrderedAndProject: "
        "each task keeps its local k smallest hashes and the driver "
        "merges k-sized heaps — no global sort, no rand(), shuffle "
        "volume k x partitions rows at any corpus size. md5 hex "
        "compares identically (lowercase, fixed width) in both "
        "engines, and doc_id uniqueness makes the order total.",
)
def q_pipeline_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (docs.select(
        "doc_id", "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string")))
         .alias("sample_hash"))
        .orderBy("sample_hash")
        .limit(BOTTOMK_K))


# ---------------------------------------------------------------------------
# Per-group bottom-k: ClickHouse's `LIMIT k BY group` applied to the
# minwise sample — k deterministic sample docs from EVERY source (the
# stratified flavor of pipeline_bottomk_sample). One shuffle on source;
# each reducer ranks only its group's hashes.

BOTTOMK_PER_SOURCE = 3


@register(
    "pipeline_bottomk_per_source",
    oracle=f"""
WITH h AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5('sample:' || CAST(doc_id AS VARCHAR)) AS sample_hash
  FROM documents
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY sample_hash)
           AS rk
  FROM h
)
SELECT doc_id, source, n_tokens, sample_hash, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {BOTTOMK_PER_SOURCE}""",
    doc="ClickHouse `LIMIT k BY source` parity as stratified minwise "
        "sampling: the k hash-smallest docs of every source. Window "
        "rank over the salted hash inside each source partition — "
        "reuses the same deterministic hash as the global bottom-k, so "
        "the strata compose (a doc in the global sample is in its "
        "stratum's sample whenever rates align).",
)
def q_pipeline_bottomk_per_source(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id", "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string")))
         .alias("sample_hash"))
    w = Window.partitionBy("source").orderBy("sample_hash")
    return (h.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= BOTTOMK_PER_SOURCE))


# ---------------------------------------------------------------------------
# Blocklist scrubbing: the C4-style bad-words pass every web-scale
# training pipeline runs (C4 drops pages containing listed words;
# production variants redact instead of dropping). Both behaviors in
# one operator: occurrences are counted and REDACTED per doc, and docs
# whose blocked-token ratio exceeds 5% are dropped. The blocklist terms
# are chosen to be frequent in the synthetic corpus so both branches
# are exercised at every SF. The ratio test is an integer-product
# compare (n_blocked * 20 > n_tokens), never a float ratio, and the
# redacted corpus is pinned by a per-source md5 checksum so the oracle
# verifies byte-identical scrub output, not just counts.

BLOCK_PATTERN = r"\b(slow|dup|spark)\b"   # word-boundary, RE2+Java compatible
BLOCK_REDACTION = "[X]"


@register(
    "pipeline_blocklist_scrub",
    oracle=rf"""
WITH m AS (
  SELECT source,
         len(string_split(text, ' ')) AS n_tokens,
         len(regexp_extract_all(text, '{BLOCK_PATTERN}')) AS n_blocked,
         regexp_replace(text, '{BLOCK_PATTERN}', '{BLOCK_REDACTION}', 'g')
           AS scrubbed
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(CASE WHEN n_blocked * 20 > n_tokens THEN 1 END) AS BIGINT)
         AS n_dropped,
       CAST(sum(n_blocked) AS BIGINT) AS blocked_tokens,
       CAST(sum(CASE WHEN n_blocked * 20 <= n_tokens
                THEN ('0x' || substr(md5(scrubbed), 1, 8))::BIGINT
                ELSE 0 END) AS BIGINT) AS scrub_checksum
FROM m GROUP BY source""",
    doc="C4-style blocklist pass: count + redact blocklisted words "
        "(word-boundary regex, applied globally), drop docs whose "
        "blocked ratio exceeds 5% (integer-product compare), and "
        "checksum the redacted text of kept docs per source so the "
        "oracle pins the scrub output byte-for-byte. Row-local regex "
        "work stays JVM-side (regexp_count / regexp_replace); the only "
        "shuffle is the final per-source rollup.",
)
def q_pipeline_blocklist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.regexp_count("text", F.lit(BLOCK_PATTERN)).cast("long")
         .alias("n_blocked"),
        F.regexp_replace("text", BLOCK_PATTERN, BLOCK_REDACTION)
         .alias("scrubbed"))
    dropped = F.col("n_blocked") * 20 > F.col("n_tokens")
    kept_checksum = F.when(
        ~dropped,
        F.conv(F.substring(F.md5("scrubbed"), 1, 8), 16, 10).cast("long")
    ).otherwise(F.lit(0))
    return (m.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count(F.when(dropped, 1)).cast("long").alias("n_dropped"),
        F.sum("n_blocked").cast("long").alias("blocked_tokens"),
        F.sum(kept_checksum).cast("long").alias("scrub_checksum")))


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle: the global training-order permutation +
# shard assignment a dataloader consumes. Classic two-level design:
# shard = hash bucket (pure row-local function), position within shard
# = rank of the same hash. Reproducible across runs AND engines (no
# rand()); changing EPOCH_SEED re-permutes everything. At 100 TB the
# per-shard rank is the only non-row-local step, and it sorts each
# shard independently after a shuffle on the shard key — raise
# EPOCH_SHARDS so shards fit a reducer; there is never a global sort.

EPOCH_SEED = "epoch0|"
EPOCH_SHARDS = 8


@register(
    "pipeline_epoch_shuffle",
    oracle=f"""
WITH h AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5('{EPOCH_SEED}' || CAST(doc_id AS VARCHAR)) AS shuffle_hash
  FROM documents
),
s AS (
  SELECT *, ('0x' || substr(shuffle_hash, 1, 8))::BIGINT % {EPOCH_SHARDS}
           AS shard
  FROM h
)
SELECT doc_id, n_tokens, shuffle_hash, CAST(shard AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY shard
                               ORDER BY shuffle_hash, doc_id) AS BIGINT)
         AS pos
FROM s""",
    doc="Deterministic epoch shuffle for training dataloaders: salted-"
        "hash permutation split into hash shards with an in-shard "
        "position rank. Seed change => new permutation; identical "
        "output on every engine/run (no rand()). One shuffle on the "
        "shard key; per-shard sort only — no global sort at any scale.",
)
def q_pipeline_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.md5(F.concat(F.lit(EPOCH_SEED), F.col("doc_id").cast("string")))
         .alias("shuffle_hash"))
    s = h.withColumn(
        "shard",
        (F.conv(F.substring("shuffle_hash", 1, 8), 16, 10).cast("long")
         % EPOCH_SHARDS))
    w = Window.partitionBy("shard").orderBy("shuffle_hash", "doc_id")
    return s.withColumn("pos", F.row_number().over(w).cast("long"))


# ---------------------------------------------------------------------------
# Temperature-based source mixing: the multilingual/multi-corpus
# sampling rule (alpha-smoothing a la XLM-R / mT5 / The Pile's
# per-source epochs): sample source s with probability proportional to
# p_s^alpha, alpha in [0,1] — alpha=1 keeps the natural token
# distribution, alpha=0 makes sources uniform, in between up-weights
# small sources. At alpha=0.5 the per-document acceptance rate
# against the LARGEST-rate anchor reduces to
#     rate_s = (t_min / t_s)^(1-alpha) = sqrt(t_min / t_s)
# (t_s = source token mass): the normalizing sums cancel, so the rate
# is two correctly-rounded sqrts and one division — bit-identical on
# any IEEE engine, with NO float summation anywhere. The rate is
# realized as a deterministic salted-hash Bernoulli gate (bucket <
# floor(rate*10000)), the same reproducible-split rule as
# pipeline_split_assign: re-running on any engine samples the exact
# same documents. Two linear passes over the corpus (per-source mass,
# then the gated re-aggregate) with a broadcast-size source table in
# between — no extra shuffle at any scale.

TEMP_ALPHA = 0.5         # documented; the rate formula below is its
                         # closed form
TEMP_BUCKETS = 10_000
TEMP_SALT = "temp:"


@register(
    "pipeline_temperature_mix",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         (('0x' || substr(md5('{TEMP_SALT}' || CAST(doc_id AS VARCHAR)),
           1, 8))::BIGINT % {TEMP_BUCKETS}) AS bucket
  FROM documents
), src AS (
  SELECT source, count(*) AS docs, sum(n_tokens) AS toks
  FROM d GROUP BY 1
), anchor AS (
  SELECT min(toks) AS t_min FROM src
), thr AS (
  SELECT source, docs, toks,
         CAST(floor((sqrt(CAST(t_min AS DOUBLE))
                     / sqrt(CAST(toks AS DOUBLE))) * 10000) AS BIGINT)
           AS threshold
  FROM src, anchor
), samp AS (
  SELECT d.source,
         count(*) FILTER (d.bucket < t.threshold) AS sampled_docs,
         coalesce(sum(d.n_tokens) FILTER (d.bucket < t.threshold), 0)
           AS sampled_toks
  FROM d JOIN thr t ON t.source = d.source
  GROUP BY 1
)
SELECT t.source, CAST(t.docs AS BIGINT) AS docs,
       CAST(t.toks AS BIGINT) AS toks, t.threshold,
       CAST(s.sampled_docs AS BIGINT) AS sampled_docs,
       CAST(s.sampled_toks AS BIGINT) AS sampled_toks
FROM thr t JOIN samp s ON s.source = t.source""",
    doc="Temperature-based source mixing (alpha=0.5): per-source "
        "acceptance rate sqrt(t_min/t_s) over token mass, realized as "
        "a deterministic salted-hash Bernoulli gate (bucket-of-10000 "
        "< floor(rate*10000)) so every engine samples the same "
        "documents. Per-source docs/tokens before and after, plus the "
        "integer threshold. Smallest source keeps rate 1.0 exactly.",
)
def q_pipeline_temperature_mix(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        (F.conv(F.substring(
            F.md5(F.concat(F.lit(TEMP_SALT),
                           F.col("doc_id").cast("string"))), 1, 8),
            16, 10).cast("long") % TEMP_BUCKETS).alias("bucket"))
    src = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum("n_tokens").cast("long").alias("toks"))
    anchor = src.agg(F.min("toks").alias("t_min"))
    thr = src.crossJoin(F.broadcast(anchor)).select(
        "source", "docs", "toks",
        F.floor((F.sqrt(F.col("t_min").cast("double"))
                 / F.sqrt(F.col("toks").cast("double")))
                * F.lit(10000)).cast("long").alias("threshold"))
    keep = F.col("bucket") < F.col("threshold")
    samp = (
        d.join(F.broadcast(thr.select("source", "threshold")), "source")
        .groupBy("source")
        .agg(F.sum(F.when(keep, 1).otherwise(0)).cast("long")
             .alias("sampled_docs"),
             F.sum(F.when(keep, F.col("n_tokens")).otherwise(0))
             .cast("long").alias("sampled_toks"))
    )
    return (thr.join(samp, "source")
            .select("source", "docs", "toks", "threshold",
                    "sampled_docs", "sampled_toks"))


# ---------------------------------------------------------------------------
# DSIR: Data Selection with Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169) — the standard recipe for selecting raw-corpus
# documents that "look like" a small target domain, using hashed
# n-gram features so the two distributions are bounded-size tables:
#
#   bucket(w)  = md5-hash of the token into B buckets
#   p_tgt[b]   = (cnt_tgt[b] + 1) / (N_tgt + B)     (add-one smoothing)
#   p_raw[b]   = (cnt_raw[b] + 1) / (N_raw + B)
#   logw(doc)  = sum_b tf[doc,b] * (ln p_tgt[b] - ln p_raw[b])
#
# The paper then Gumbel-samples without replacement; the verifiable
# deterministic form selects top-K by (logw DESC, doc_id) — the same
# ranking the sampler concentrates on, minus the noise term.
#
# Scale shape: the feature distributions are TWO combinable B-row
# aggregates (B = 512 — broadcast-size at any corpus); per-doc tf is
# one explode + groupBy; the score is a per-doc fold over <=B sorted
# buckets (the events_k_entropy order-pinned float recipe: all counts
# exact integers, ln terms folded in sorted-bucket order, rounded to 6
# decimals); the final top-K is TakeOrdered. Everything is linear in
# corpus tokens, and no table bigger than B ever broadcasts.

DSIR_B = 512
DSIR_SALT = "dsir:"
DSIR_TARGET = "src0"     # target-domain sample: one reference source
DSIR_TOPK = 100


@register(
    "pipeline_dsir_sample",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, source,
         (('0x' || substr(md5('{DSIR_SALT}' || token), 1, 8))::BIGINT
          % {DSIR_B}) AS b
  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
        FROM documents)
  WHERE token <> ''
),
tgt AS (SELECT b, count(*) AS ct FROM tok
        WHERE source = '{DSIR_TARGET}' GROUP BY b),
raw AS (SELECT b, count(*) AS cr FROM tok GROUP BY b),
tots AS (SELECT CAST((SELECT sum(ct) FROM tgt) AS BIGINT) AS nt,
                CAST((SELECT sum(cr) FROM raw) AS BIGINT) AS nr),
lam AS (
  SELECT r.b,
         ln(CAST(coalesce(t.ct, 0) + 1 AS DOUBLE)
            / CAST(nt + {DSIR_B} AS DOUBLE))
         - ln(CAST(r.cr + 1 AS DOUBLE)
              / CAST(nr + {DSIR_B} AS DOUBLE)) AS lam
  FROM raw r LEFT JOIN tgt t ON t.b = r.b, tots
),
tf AS (SELECT doc_id, b, count(*) AS tf FROM tok
       WHERE source <> '{DSIR_TARGET}' GROUP BY doc_id, b),
agg AS (
  SELECT tf.doc_id,
         CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
         list(CAST(tf.tf AS DOUBLE) * l.lam ORDER BY tf.b) AS parts
  FROM tf JOIN lam l ON l.b = tf.b
  GROUP BY tf.doc_id
)
SELECT d.doc_id, d.source, a.n_tokens,
       round(list_sum(a.parts), 6) AS dsir_logweight
FROM agg a JOIN documents d ON d.doc_id = a.doc_id
ORDER BY dsir_logweight DESC, d.doc_id
LIMIT {DSIR_TOPK}""",
    doc="DSIR importance resampling (hashed-unigram form): score every "
        "non-target document by the log-likelihood ratio of its "
        "tokens under the target-domain vs raw-corpus hashed-unigram "
        "distributions (512 buckets, add-one smoothing), select the "
        "deterministic top-100. Two broadcast-size feature aggregates, "
        "one per-doc sorted-bucket float fold, one TakeOrdered.",
)
def q_pipeline_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # OPTIMIZATION r11 (guide §2.3/§2.4): the target and raw feature
    # distributions ride ONE aggregation (ct = conditional count) —
    # the old tgt/raw split re-ran the tokenize+md5 map a third time
    # and paid a tgt⋈raw left join; ct = 0 where that join produced
    # NULL, and both feed +1 smoothing identically (measured 1.06 →
    # 0.78 s at sf0.1; an ensure_parallelism variant measured SLOWER —
    # the text repartition costs more than 32-wide tokenize saves).
    docs = load_table(spark, sf_dir, "documents")
    tok = (docs.select("doc_id", "source",
                       F.explode(F.split("text", " ")).alias("token"))
           .filter(F.col("token") != "")
           .select("doc_id", "source",
                   (F.conv(F.substring(
                       F.md5(F.concat(F.lit(DSIR_SALT), F.col("token"))),
                       1, 8), 16, 10).cast("long") % DSIR_B).alias("b")))
    dists = (tok.groupBy("b").agg(
        F.sum(F.when(F.col("source") == DSIR_TARGET, 1).otherwise(0))
         .alias("ct"),
        F.count(F.lit(1)).alias("cr")))
    tots = dists.agg(F.sum("ct").cast("long").alias("nt"),
                     F.sum("cr").cast("long").alias("nr"))
    lam = (dists.crossJoin(F.broadcast(tots))
           .select("b",
                   (F.log((F.col("ct") + 1).cast("double")
                          / (F.col("nt") + DSIR_B).cast("double"))
                    - F.log((F.col("cr") + 1).cast("double")
                            / (F.col("nr") + DSIR_B).cast("double")))
                   .alias("lam")))
    tf = (tok.filter(F.col("source") != DSIR_TARGET)
          .groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("tf")))
    agg = (tf.join(F.broadcast(lam), "b")
           .groupBy("doc_id")
           .agg(F.sum("tf").cast("long").alias("n_tokens"),
                F.sort_array(F.collect_list(
                    F.struct("b", "tf", "lam"))).alias("parts")))
    fold = F.aggregate(
        F.col("parts"), F.lit(0.0),
        lambda acc, s: acc + s["tf"].cast("double") * s["lam"])
    return (agg.join(docs.select("doc_id", "source"), "doc_id")
            .select("doc_id", "source", "n_tokens",
                    F.round(fold, 6).alias("dsir_logweight"))
            .orderBy(F.col("dsir_logweight").desc(), "doc_id")
            .limit(DSIR_TOPK))
