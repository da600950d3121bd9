"""Benchmark-contamination detection (beyond-reference surface): find
training documents that contain verbatim n-gram runs from a held-out
evaluation set — the pre-training hygiene check every LLM data pipeline
runs before a corpus ships.

Mechanism (the standard n-gram collision scheme): both sides are cut
into 8-word shingles, shingles are md5-hashed (32-byte keys shuffle,
not text), and an equi-join on the hash yields per (train_doc,
eval_doc) common-shingle counts; a pair is contaminated when the
overlap covers >= half the eval document's shingles.

Scale: candidate generation is one linear shingle pass per side plus an
equi-join on the hash key — same shape as dedup_minhash_lsh's band
join. The eval side of a real contamination check (a benchmark suite)
is tiny; here it is 10 % of the corpus, so the join is left to AQE
rather than force-broadcast. Work is ∝ hash collisions, i.e. actual
shared n-grams.

Eval-set membership is a deterministic id rule (doc_id % 10 = 0) so
both engines select identical sides without a seed channel.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import ensure_parallelism, load_table
from .dedup import DOC_SETS_SQL as _DEDUP_DOC_SETS_SQL
from .dedup import JACCARD_THRESHOLD as _DEDUP_JACCARD_THRESHOLD
from .dedup import _minhash_sql as _dedup_minhash_sql
from .dedup import shingles_col
from ..caches import PlanCache
from .registry import register

CONTAM_K = 8             # shingle width (words)
CONTAM_THRESHOLD = 0.5   # fraction of eval shingles that must collide
EVAL_MOD = 10            # doc_id % 10 == 0 -> held-out eval doc


def _shingle_concat_sql(k: int) -> str:
    parts = " || ' ' || ".join(f"w[i+{j}]" if j else "w[i]" for j in range(k))
    return (f"list_transform(range(1, len(w) - {k - 2}), i -> {parts})")


_SH_SQL = f"""
words AS (
  SELECT doc_id, source, doc_id % {EVAL_MOD} = 0 AS is_eval,
         string_split(text, ' ') AS w
  FROM documents
  WHERE len(string_split(text, ' ')) >= {CONTAM_K}
),
sh AS (
  SELECT DISTINCT doc_id, source, is_eval,
         md5(unnest({_shingle_concat_sql(CONTAM_K)})) AS h
  FROM words
)"""


def doc_shingle_hashes_df(docs: DataFrame) -> DataFrame:
    """Distinct (doc_id, md5-shingle, is_eval) index for any documents
    frame: the distinct shuffles only the 2 narrow key columns —
    is_eval is re-derived from doc_id afterwards, and a doc's source is
    joined back onto the (tiny) flagged output, never carried per
    shingle. Shared by the batch query and the streaming monitor."""
    words = F.split("text", " ")
    return (
        ensure_parallelism(docs)
        .filter(F.size(words) >= CONTAM_K)
        .select("doc_id",
                F.explode(shingles_col(F.col("text"), k=CONTAM_K))
                 .alias("shingle"))
        .select("doc_id", F.md5("shingle").alias("h"))
        .distinct()
        .withColumn("is_eval", F.col("doc_id") % EVAL_MOD == 0)
    )


# one persisted hash index per (session, sf_dir) — same policy as the
# MinHash shingle/pair caches in dedup.py: without it every invocation
# pins a NEW duplicate copy in the block manager (repeated bench runs
# accumulated copies until eviction pressure showed up as multi-x
# first-run noise).
_HASH_CACHE: dict[tuple[str, str], DataFrame] = PlanCache()


def _doc_shingle_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch query's persisted index: three consumers (train side,
    eval side, per-eval-doc totals) read it."""
    # applicationId (not id(spark)): a recycled Python object id can
    # never alias a stale persisted plan from a dead session.
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _HASH_CACHE:
        _HASH_CACHE[key] = (
            doc_shingle_hashes_df(load_table(spark, sf_dir, "documents"))
            .persist(StorageLevel.MEMORY_AND_DISK))
    return _HASH_CACHE[key]


@register(
    "contamination_ngram_overlap",
    oracle=f"""
WITH {_SH_SQL.strip()},
n_eval AS (
  SELECT doc_id, count(*) AS n FROM sh WHERE is_eval GROUP BY 1
),
pairs AS (
  SELECT t.doc_id AS train_doc, t.source AS train_source,
         e.doc_id AS eval_doc, count(*) AS common
  FROM sh t JOIN sh e ON t.h = e.h AND NOT t.is_eval AND e.is_eval
  GROUP BY 1, 2, 3
)
SELECT p.train_doc, p.train_source, p.eval_doc,
       CAST(p.common AS BIGINT) AS common_shingles,
       CAST(n.n AS BIGINT) AS n_eval_shingles,
       p.common / n.n AS overlap
FROM pairs p JOIN n_eval n ON n.doc_id = p.eval_doc
WHERE p.common / n.n >= {CONTAM_THRESHOLD}""",
    doc="Benchmark contamination: (train_doc, eval_doc) pairs whose "
        "8-gram collision set covers >= 50 % of the eval document. "
        "Linear shingle passes + equi-join on md5 keys; overlap is an "
        "exact integer ratio.",
)
def q_contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _doc_shingle_hashes(spark, sf_dir)
    train = sh.filter(~F.col("is_eval")).select(
        F.col("doc_id").alias("train_doc"), "h")
    ev = sh.filter(F.col("is_eval")).select(
        F.col("doc_id").alias("eval_doc"), "h")
    n_eval = ev.groupBy("eval_doc").agg(F.count(F.lit(1)).alias("n"))
    pairs = (train.join(ev, "h")
             .groupBy("train_doc", "eval_doc")
             .agg(F.count(F.lit(1)).alias("common")))
    overlap = F.col("common") / F.col("n")
    sources = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("train_doc"),
        F.col("source").alias("train_source"))
    # no broadcast hint: the flagged-pairs side is the small one (AQE
    # broadcasts it at runtime); hinting `sources` would ship the whole
    # doc->source map to every executor at corpus scale
    return (pairs.join(n_eval, "eval_doc")
            .filter(overlap >= CONTAM_THRESHOLD)
            .join(sources, "train_doc")
            .select("train_doc", "train_source", "eval_doc",
                    F.col("common").cast("long").alias("common_shingles"),
                    F.col("n").cast("long").alias("n_eval_shingles"),
                    overlap.alias("overlap")))


# ---------------------------------------------------------------------------
# Fuzzy decontamination: NEAR-duplicate contamination. Verbatim 8-gram
# collision (above) misses an eval document that was lightly rephrased
# into the training set; production decontamination (GPT-3 appendix C,
# The Pile, FineWeb) therefore ALSO removes training docs that are
# near-duplicates of eval docs. The pair machinery is exactly the
# MinHash-LSH dedup path — so this query consumes the session-cached
# confirmed-pairs set (one more reader of the materialized dup-pairs
# table; zero additional shuffles beyond the id-parity filter).

@register(
    "contamination_neardup",
    oracle=f"""
WITH {_DEDUP_DOC_SETS_SQL.strip()},
{_dedup_minhash_sql().strip()},
pairs AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(a.sh, b.sh))
           / (a.n + b.n - len(list_intersect(a.sh, b.sh))) AS jaccard
  FROM candidates c
  JOIN doc_sets_n a ON a.doc_id = c.doc_a
  JOIN doc_sets_n b ON b.doc_id = c.doc_b
  WHERE len(list_intersect(a.sh, b.sh))
          / (a.n + b.n - len(list_intersect(a.sh, b.sh)))
          >= {_DEDUP_JACCARD_THRESHOLD}
)
SELECT CASE WHEN doc_a % {EVAL_MOD} = 0 THEN doc_a ELSE doc_b END
         AS eval_doc,
       CASE WHEN doc_a % {EVAL_MOD} = 0 THEN doc_b ELSE doc_a END
         AS train_doc,
       jaccard
FROM pairs
WHERE (doc_a % {EVAL_MOD} = 0) <> (doc_b % {EVAL_MOD} = 0)""",
    doc="Near-duplicate contamination (fuzzy decontamination): "
        "confirmed MinHash near-dup pairs where exactly one side is a "
        "held-out eval doc (doc_id % 10 = 0) — the rephrased-benchmark "
        "leak the verbatim 8-gram check cannot see. Reads the session-"
        "cached confirmed-pairs table; incremental cost is one filter.",
)
def q_contamination_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import confirmed_minhash_pairs
    pairs = confirmed_minhash_pairs(spark, sf_dir)
    a_eval = F.col("doc_a") % EVAL_MOD == 0
    b_eval = F.col("doc_b") % EVAL_MOD == 0
    return (pairs.filter(a_eval != b_eval)
            .select(F.when(a_eval, F.col("doc_a")).otherwise(F.col("doc_b"))
                    .alias("eval_doc"),
                    F.when(a_eval, F.col("doc_b")).otherwise(F.col("doc_a"))
                    .alias("train_doc"),
                    "jaccard"))
