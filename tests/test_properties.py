"""Property-based tests (hypothesis) for the scalar function library:
the bucketing functions must agree with their Python/ClickHouse
definitions on arbitrary inputs, and the retraction algebra must cancel
exactly."""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st

from pyspark.sql import Row, functions as F

from clickhouse_aggregation_spark.functions.bucketing import (
    BLOCKS_PER_DAY, SIZE_EDGES, block_range_day, int_div, size_bucket,
    to_yyyymm, to_yyyymmdd,
)

_settings = settings(max_examples=10, deadline=None)


@_settings
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1,
                max_size=50),
       st.integers(min_value=1, max_value=100_000))
def test_int_div_matches_python_floordiv(spark, values, divisor):
    df = spark.createDataFrame([Row(v=v) for v in values])
    got = [r[0] for r in
           df.select(int_div(F.col("v"), divisor)).collect()]
    assert got == [v // divisor for v in values]


@_settings
@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1,
                max_size=50))
def test_size_bucket_edges(spark, values):
    df = spark.createDataFrame([Row(v=v) for v in values])
    got = [r[0] for r in df.select(size_bucket(F.col("v"))).collect()]

    def ref(v):
        if v < SIZE_EDGES[0]:
            return "small"
        if v < SIZE_EDGES[1]:
            return "medium"
        if v < SIZE_EDGES[2]:
            return "large"
        return "whale"
    assert got == [ref(v) for v in values]


@_settings
@given(st.lists(st.datetimes(min_value=datetime.datetime(1980, 1, 2),
                             max_value=datetime.datetime(2200, 12, 30)),
                min_size=1, max_size=30))
def test_yyyymm_yyyymmdd_match_python(spark, stamps):
    df = spark.createDataFrame([Row(ts=t) for t in stamps])
    got = df.select(to_yyyymm(F.col("ts")).alias("m"),
                    to_yyyymmdd(F.col("ts")).alias("d")).collect()
    for row, t in zip(got, stamps):
        assert row["m"] == t.year * 100 + t.month
        assert row["d"] == t.year * 10000 + t.month * 100 + t.day


@_settings
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=10),     # group key
              st.integers(min_value=1, max_value=10**9)), # value
    min_size=1, max_size=60))
def test_retraction_algebra_cancels_exactly(spark, rows):
    """insert(+1) then retract(-1) then replace(+1, v') must equal
    having only ever inserted v' — for every group, exactly."""
    base = [Row(g=g, value=v, sign=1) for g, v in rows]
    retract = [Row(g=g, value=v, sign=-1) for g, v in rows]
    replaced = [Row(g=g, value=v * 2, sign=1) for g, v in rows]
    full = spark.createDataFrame(base + retract + replaced)
    only_final = spark.createDataFrame(replaced)

    def net(df):
        return {(r["g"]): (r["nv"], r["nc"]) for r in
                df.groupBy("g").agg(
                    F.sum(F.col("value") * F.col("sign")).alias("nv"),
                    F.sum("sign").alias("nc")).collect()}
    assert net(full) == net(only_final)


@_settings
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_block_day_consistent_with_hour(spark, block):
    df = spark.createDataFrame([Row(b=block)])
    row = df.select(
        block_range_day(F.col("b")).alias("d"),
        int_div(F.col("b"), 300).alias("h")).first()
    # 24 hour-buckets per day-bucket: hour div 24 == day
    assert row["h"] // 24 == row["d"]
    assert row["d"] == block // BLOCKS_PER_DAY


@_settings
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                max_size=40))
def test_hash_bucket_range_and_engine_parity(spark, doc_ids):
    """The split hash gate must land in [0, 100) and agree with DuckDB
    on arbitrary ids (the md5-hex → int path both engines share)."""
    import duckdb

    from clickhouse_aggregation_spark.operators.pipeline import (
        SPLIT_BUCKETS, _hash_bucket,
    )
    df = spark.createDataFrame([Row(doc_id=d) for d in doc_ids])
    got = [r[0] for r in df.select(_hash_bucket("split:")).collect()]
    assert all(0 <= b < SPLIT_BUCKETS for b in got)
    con = duckdb.connect()
    want = [con.execute(
        "SELECT ('0x' || substr(md5('split:' || CAST(? AS VARCHAR)), 1, 8))"
        f"::BIGINT % {SPLIT_BUCKETS}", [d]).fetchone()[0] for d in doc_ids]
    assert got == want


@_settings
@given(st.lists(st.integers(min_value=1, max_value=2**40), min_size=1,
                max_size=40))
def test_bit_length_bucket_bounds(spark, counts):
    """Every n must satisfy bucket_lo <= n <= bucket_hi for the
    power-of-2 bucket derived from length(bin(n))."""
    df = spark.createDataFrame([Row(n_tokens=n) for n in counts])
    rows = df.select(
        "n_tokens",
        F.length(F.bin("n_tokens")).cast("long").alias("bucket_id"),
    ).selectExpr(
        "n_tokens",
        "shiftleft(cast(1 as bigint), cast(bucket_id as int) - 1) AS lo",
        "shiftleft(cast(1 as bigint), cast(bucket_id as int)) - 1 AS hi",
    ).collect()
    for r in rows:
        assert r.lo <= r.n_tokens <= r.hi, r


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """Probing the 8 Hamming-1 buckets on top of the query's own bucket
    must never lose a neighbor the single-probe variant found, and its
    recall@5 against the exact top-5 must be at least as high."""
    from clickhouse_aggregation_spark.operators.similarity import (
        q_similarity_lsh_bucketed, q_similarity_lsh_multiprobe,
        q_similarity_topk_bruteforce,
    )
    def top(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out
    exact = top(q_similarity_topk_bruteforce(spark, sf_dir))
    single = top(q_similarity_lsh_bucketed(spark, sf_dir))
    multi = top(q_similarity_lsh_multiprobe(spark, sf_dir))
    for q, truth in exact.items():
        r_single = len(truth & single.get(q, set()))
        r_multi = len(truth & multi.get(q, set()))
        assert r_multi >= r_single, (q, r_single, r_multi)


@_settings
@given(st.lists(st.integers(min_value=0, max_value=2**256 - 1),
                min_size=1, max_size=30))
def test_uint256_string_marshal_roundtrip_property(spark, values):
    """Any uint256: hex-word -> decimal string must equal Python's int,
    the reverse marshal must reproduce the exact 32-byte word, and the
    native lpad sort key must order like the integers."""
    from clickhouse_aggregation_spark.functions.decode import (
        hex_uint256_string, uint256_sort_key, uint256_string_to_hex,
    )
    rows = [Row(data="0x" + format(v, "064x")) for v in values]
    df = spark.createDataFrame(rows)
    dec = df.select("data", hex_uint256_string(F.col("data")).alias("s"))
    got = {r["data"]: r["s"] for r in dec.collect()}
    for v in values:
        assert got["0x" + format(v, "064x")] == str(v)
    back = dec.select((uint256_string_to_hex(F.col("s")) == F.col("data"))
                      .alias("ok")).collect()
    assert all(r["ok"] for r in back)
    ordered = [r["s"] for r in
               dec.orderBy(uint256_sort_key(F.col("s"))).collect()]
    assert ordered == [str(v) for v in sorted(values)]


def test_kmeans_refinement_reduces_inertia(spark, sf_dir):
    """Lloyd iterations with floor-mean centroids must not worsen the
    clustering: inertia at the final iteration <= iteration 0 (strict
    decrease is data-dependent; the fixture corpus does improve)."""
    from clickhouse_aggregation_spark.operators.similarity import (
        q_similarity_ivf_kmeans_refine,
    )
    rows = {r.iteration: r.inertia
            for r in q_similarity_ivf_kmeans_refine(spark, sf_dir).collect()}
    assert rows[max(rows)] <= rows[0]
    assert all(r > 0 for r in rows.values())


@given(st.integers(min_value=0, max_value=(1 << 60) - 1),
       st.sets(st.integers(min_value=0, max_value=59),
               min_size=0, max_size=3))
@settings(max_examples=200, deadline=None)
def test_simhash_superkey_cover_is_exact(code_a, flip_bits):
    """The pigeonhole recall claim behind dedup_simhash_hamming, pinned
    directly: ANY pair of 60-bit codes at Hamming distance <= 3 agrees
    on at least one of the 20 three-block super-keys (and the verify
    step makes precision exact, so cover = correctness)."""
    from clickhouse_aggregation_spark.operators.dedup import (
        HAMMING_MAX, SIMHASH_BLOCK_BITS, _BLOCK_MASK, _BLOCK_TRIPLES,
    )
    code_b = code_a
    for b in flip_bits:
        code_b ^= 1 << b
    assert bin(code_a ^ code_b).count("1") <= HAMMING_MAX

    def key(code, triple):
        kv = 0
        for blk in triple:
            kv = (kv << SIMHASH_BLOCK_BITS) | \
                ((code >> (blk * SIMHASH_BLOCK_BITS)) & _BLOCK_MASK)
        return kv

    assert any(key(code_a, t) == key(code_b, t) for t in _BLOCK_TRIPLES)


@given(st.sets(st.integers(min_value=0, max_value=59), min_size=4,
               max_size=10))
@settings(max_examples=100, deadline=None)
def test_simhash_superkey_cover_boundary(flip_bits):
    """Sanity complement: at Hamming > 3 the cover MAY miss (4 flips
    spread over 4 different blocks defeat every 3-block key) — i.e.
    the radius bound in the operator is the real guarantee line, not
    slack. Only asserts the documented miss CASE exists, not that
    every >3 pair misses."""
    from clickhouse_aggregation_spark.operators.dedup import (
        SIMHASH_BLOCK_BITS, _BLOCK_MASK, _BLOCK_TRIPLES,
    )
    blocks_hit = {b // SIMHASH_BLOCK_BITS for b in flip_bits}
    if len(blocks_hit) < 4:
        return     # covered case, nothing to check

    def key(code, triple):
        kv = 0
        for blk in triple:
            kv = (kv << SIMHASH_BLOCK_BITS) | \
                ((code >> (blk * SIMHASH_BLOCK_BITS)) & _BLOCK_MASK)
        return kv

    code_a = 0
    code_b = 0
    for b in flip_bits:
        code_b ^= 1 << b
    if len(blocks_hit) >= 4:
        # a triple matches iff none of its blocks were hit; with >= 4
        # distinct blocks hit, triples from the remaining <= 2 intact
        # blocks don't exist -> no key can match
        assert not any(key(code_a, t) == key(code_b, t)
                       for t in _BLOCK_TRIPLES)


@given(st.lists(st.lists(st.sampled_from("abcdefgh"),
                         min_size=0, max_size=40).map(" ".join),
                min_size=1, max_size=30),
       st.integers(min_value=1, max_value=4))
@settings(max_examples=150, deadline=None)
def test_hh_candidate_union_is_superset(docs, n_batches):
    """The pigeonhole claim behind text_heavy_hitters' vectorized
    candidate kernel (OPTIMIZATION r12), pinned directly: however the
    corpus is split into batches, the union of per-batch local
    heavy hitters (count * HH_FRACTION > batch_tokens) contains EVERY
    global heavy hitter — so the exact verify pass makes the final
    answer independent of partitioning/batching."""
    import pandas as pd

    from clickhouse_aggregation_spark.operators.text import (
        HH_FRACTION, _hh_candidates_partition,
    )

    batches = [pd.DataFrame({"text": docs[i::n_batches]})
               for i in range(n_batches)]
    batches = [b for b in batches if len(b)]
    cand = set()
    for out in _hh_candidates_partition(iter(batches)):
        cand.update(out["token"])

    toks = [t for d in docs for t in d.split(" ") if t]
    n = len(toks)
    from collections import Counter
    global_hh = {t for t, c in Counter(toks).items()
                 if c * HH_FRACTION > n}
    assert global_hh <= cand


def test_simhash_kernels_match_jvm_formulation(spark, sf_dir):
    """The r12 Arrow simhash kernels (16- and 60-bit) must reproduce
    the retired JVM explode + per-bit sign-sum aggregation BIT FOR BIT
    on the smoke corpus — the exactness claim (hashlib md5 == JVM md5,
    hex-prefix parse, 2*ones > n sign rule, per-doc distinct tokens
    including empties) pinned as a frame equality, not an argument."""
    from pyspark.sql import types as T

    from clickhouse_aggregation_spark.operators import REGISTRY
    from clickhouse_aggregation_spark.operators.dedup import (
        SIMHASH_NBITS, simhash60_groups,
    )
    from clickhouse_aggregation_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")

    # 16-bit: JVM reference (the pre-r12 formulation, verbatim)
    toks = (docs.select("doc_id",
                        F.explode(F.split("text", " ")).alias("tok"))
            .distinct()
            .select("doc_id", F.md5("tok").alias("h")))
    bit_sums = [
        F.sum(
            2 * ((F.expr(f"instr('0123456789abcdef', "
                         f"substr(h, {1 + b // 4}, 1)) - 1")
                  .cast("long") / (2 ** (3 - b % 4))).cast("long") % 2) - 1
        ).alias(f"s{b}")
        for b in range(16)
    ]
    agg = toks.groupBy("doc_id").agg(*bit_sums)
    code = None
    for b in range(16):
        term = F.when(F.col(f"s{b}") > 0, F.lit(2 ** b)).otherwise(F.lit(0))
        code = term if code is None else code + term
    ref16 = agg.select("doc_id", code.cast("long").alias("simhash16")) \
               .orderBy("doc_id").toPandas()
    got16 = REGISTRY["dedup_simhash"].raw_fn(spark, sf_dir) \
        .orderBy("doc_id").toPandas()
    assert ref16.reset_index(drop=True).equals(got16.reset_index(drop=True))

    # 60-bit: JVM reference (the pre-r12 formulation, verbatim)
    tv = (docs.select("doc_id",
                      F.explode(F.expr("array_distinct(split(text, ' '))"))
                      .alias("tok"))
          .select("doc_id",
                  F.expr("CAST(conv(substring(md5(tok), 1, 15), 16, 10) "
                         "AS BIGINT)").alias("hv")))
    sums60 = [
        F.expr(f"sum(2 * (shiftright(hv, {b}) & 1) - 1)").alias(f"s{b}")
        for b in range(SIMHASH_NBITS)
    ]
    agg60 = tv.groupBy("doc_id").agg(*sums60)
    code60 = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b}L ELSE 0L END)"
        for b in range(SIMHASH_NBITS))
    ref60 = (agg60.select(F.expr(f"CAST({code60} AS BIGINT)").alias("code"))
             .groupBy("code").agg(F.count(F.lit(1)).alias("cnt"))
             .orderBy("code").toPandas())
    got60 = simhash60_groups(docs).orderBy("code").toPandas()
    assert ref60.reset_index(drop=True).equals(got60.reset_index(drop=True))


def test_sem_cell_kernel_matches_jvm_join(spark, sf_dir):
    """The r12 per-cell SemDeDup kernel must reproduce the retired
    within-cell self-join + interpreted-HOF cosine formulation frame
    for frame (same int64 dots, same IEEE sqrt/multiply/divide order,
    same a.vec_id < b.vec_id pair orientation, same distinct-dropped
    count) on the smoke corpus."""
    from pyspark.sql import functions as F

    from clickhouse_aggregation_spark.operators import REGISTRY
    from clickhouse_aggregation_spark.operators.dedup import SEM_EPS
    from clickhouse_aggregation_spark.operators.similarity import (
        int_dot, sem_corpus,
    )

    corpus = sem_corpus(spark, sf_dir)
    a, b = corpus.alias("a"), corpus.alias("b")
    cos = (int_dot(F.col("a.qv"), F.col("b.qv"))
           / (F.sqrt(F.col("a.norm2")) * F.sqrt(F.col("b.norm2"))))
    pairs = (
        a.join(b, (F.col("a.centroid_id") == F.col("b.centroid_id"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.centroid_id").alias("centroid_id"),
                F.col("b.vec_id").alias("dropped_vec"),
                cos.alias("cosine"))
        .filter(F.col("cosine") >= SEM_EPS))
    members = (corpus.groupBy("centroid_id")
               .agg(F.count(F.lit(1)).cast("long").alias("members")))
    stats = (pairs.groupBy("centroid_id")
             .agg(F.count(F.lit(1)).cast("long").alias("dup_pairs"),
                  F.countDistinct("dropped_vec").cast("long")
                  .alias("dropped")))
    ref = (members.join(stats, "centroid_id", "left")
           .select("centroid_id", "members",
                   F.coalesce(F.col("dup_pairs"), F.lit(0)).cast("long")
                   .alias("dup_pairs"),
                   F.coalesce(F.col("dropped"), F.lit(0)).cast("long")
                   .alias("dropped"),
                   (F.col("members")
                    - F.coalesce(F.col("dropped"), F.lit(0))).cast("long")
                   .alias("kept"))
           .orderBy("centroid_id").toPandas())
    got = REGISTRY["dedup_semantic"].raw_fn(spark, sf_dir) \
        .orderBy("centroid_id").toPandas()
    assert ref.reset_index(drop=True).equals(got.reset_index(drop=True))
