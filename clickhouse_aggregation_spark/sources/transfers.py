"""Canonical ``transfers`` table, synthesized deterministically from the
driver's ``events`` table (FIXTURES.md §1).

The reference's core table is ``usdc_transfer(id, block, "from", "to",
value, txn_hash)`` (reference: usdc-transfers/db/migrations/
1691424065505-Data.js:5) enriched by the CDC mirror with ``_sign`` /
``_version`` (usdc-transfers/README.md:150) and consumed by analytics
SQL that expects ``from_address/to_address/block_timestamp/...``
(usdc-transfers/sql/analytics.sql:15-19,96-103).

Because the driver's correctness gate runs every declared query on
Spark AND on DuckDB over the same parquet, the synthesis here uses only
primitives that are bit-deterministic and identical across both engines:

* integer arithmetic (``div``, ``%``) on non-negative BIGINTs,
* ``md5`` over UTF-8 strings (both engines return lowercase hex),
* ``lpad`` / ``substr`` / ``concat`` (both 1-indexed),
* epoch-second extraction with floor (Spark ``unix_timestamp`` is
  already floor; DuckDB needs an explicit ``floor``),
* timestamp reconstruction by adding whole seconds to a literal.

Mapping (FIXTURES.md §1 "derivation from driver tables"):
  block_number    = 6_082_465 + (epoch(ts) - epoch(2000-01-01)) div 12
                    (12 s/block; backfill start block per reference
                    usdc-transfers/src/main.ts:47)
  block_timestamp = ts truncated to its 12 s block boundary, so block-
                    arithmetic bucketing (intDiv(block,7200)) and
                    timestamp bucketing (toDate) agree (FIXTURES.md §6.2)
  value           = integer micro-USDC spanning all four histogram
                    buckets <1e8 / <1e9 / <1e10 / >=1e10
                    (usdc-transfers/sql/analytics.sql:77-82)
  _sign/_version  = every 50th event gets a retraction (-1, v2) plus a
                    replacement (+1, v3, value doubled) to exercise the
                    reorg/CDC semantics (usdc-transfers/src/main.ts:31-35)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..caches import PlanCache
from .tables import load_table

GENESIS_EPOCH = 946_684_800          # 2000-01-01T00:00:00Z
BLOCK0 = 6_082_465                   # reference main.ts:47
SECONDS_PER_BLOCK = 12
RETRACT_EVERY = 50                   # every 50th event is reorged

# Lazy PLAN cache (OPTIMIZATION r11): ~20 bench queries derive from
# transfers, and each call built the same ~50-expression projection
# tree through py4j (~0.3 s of pure driver time per call, measured).
# The derivation is a deterministic function of (session, sf_dir) and a
# DataFrame is an immutable lazy plan, so all callers share one object.
# Nothing is persisted — every action recomputes from events.parquet.
_TRANSFERS_CACHE: dict[tuple[str, str], DataFrame] = PlanCache(
    capacity=16, on_evict=lambda _v: None, notify_family_evict=False)


def transfers_df(spark: SparkSession, sf_dir: str,
                 wide: bool = False) -> DataFrame:
    """Synthesize the canonical transfers table (lazy plan over events).

    The whole derivation is narrow (no shuffle): one projection plus a
    3-way union of projections, so at 100 TB it stays embarrassingly
    parallel and fuses into downstream scans via whole-stage codegen.

    ``wide=True`` (OPTIMIZATION r11, guide §2.5 input skew): round-robin
    repartition the events SCAN below the projection when it yields
    fewer splits than cores (``ensure_parallelism`` — a no-op at scale,
    where inputs arrive in thousands of splits). For consumers that
    materialize the FULL row width (ABI decode round-trip, point lookup,
    LWW window dedup), the md5/hex synthesis is the map stage and a
    single small file serializes it; measured: abi_decode 0.90→0.47 s,
    dedup_latest 1.11→0.74 s. Aggregating consumers measured flat-to-
    worse under the extra exchange (they prune the wide columns), so
    the default stays narrow.
    """
    key = (spark.sparkContext.applicationId, "wide" if wide else "",
           sf_dir)
    cached = _TRANSFERS_CACHE.get(key)
    if cached is not None:
        return cached
    ev = load_table(spark, sf_dir, "events")
    if wide:
        from .tables import ensure_parallelism
        ev = ensure_parallelism(ev)
    base = ev.select(
        F.col("event_id"),
        F.col("user_id"),
        F.expr(
            f"(unix_timestamp(cast(ts as timestamp)) - {GENESIS_EPOCH})"
            f" div {SECONDS_PER_BLOCK}"
        ).alias("blk_off"),
    ).select(
        F.col("event_id"),
        (F.lit(BLOCK0) + F.col("blk_off")).cast("int").alias("block_number"),
        F.expr(
            f"timestamp_seconds({GENESIS_EPOCH} + blk_off * {SECONDS_PER_BLOCK})"
        ).alias("block_timestamp"),
        (F.col("event_id") % 1000).cast("int").alias("log_index"),
        F.concat(
            F.lit("0x"),
            F.md5(F.concat(F.lit("tx"), F.expr("cast(event_id div 3 as string)"))),
            F.md5(F.concat(F.lit("tx2"), F.expr("cast(event_id div 3 as string)"))),
        ).alias("transaction_hash"),
        # 40-hex (20-byte) EVM addresses: md5 gives 32 chars, so two
        # salted digests are concatenated and truncated
        F.concat(
            F.lit("0x"),
            F.substring(
                F.concat(
                    F.md5(F.concat(F.lit("f"), F.col("user_id").cast("string"))),
                    F.md5(F.concat(F.lit("f2"), F.col("user_id").cast("string")))),
                1, 40),
        ).alias("from_address"),
        F.concat(
            F.lit("0x"),
            F.substring(
                F.concat(
                    F.md5(F.concat(F.lit("t"),
                                   (F.col("user_id") * 31 + F.col("event_id") % 7).cast("string"))),
                    F.md5(F.concat(F.lit("t2"),
                                   (F.col("user_id") * 31 + F.col("event_id") % 7).cast("string")))),
                1, 40),
        ).alias("to_address"),
        (
            (F.col("event_id") % 900 + 100)
            * F.when(F.col("event_id") % 4 == 0, F.lit(100_000))
               .when(F.col("event_id") % 4 == 1, F.lit(1_000_000))
               .when(F.col("event_id") % 4 == 2, F.lit(10_000_000))
               .otherwise(F.lit(100_000_000))
        ).cast("decimal(38,0)").alias("value"),
    ).withColumn(
        "log_id",
        F.concat(F.lpad(F.col("block_number").cast("string"), 10, "0"),
                 F.lit("-"),
                 F.lpad(F.col("log_index").cast("string"), 6, "0")),
    )

    cols = ["log_id", "block_number", "block_timestamp", "log_index",
            "transaction_hash", "from_address", "to_address", "value"]
    reorged = base.filter(F.col("event_id") % RETRACT_EVERY == 0)

    live = base.select(*cols,
                       F.lit(1).alias("_sign"),
                       F.lit(1).cast("long").alias("_version"))
    retracted = reorged.select(*cols,
                               F.lit(-1).alias("_sign"),
                               F.lit(2).cast("long").alias("_version"))
    replaced = reorged.select(
        *cols[:-1],
        (F.col("value") * 2).cast("decimal(38,0)").alias("value"),
        F.lit(1).alias("_sign"),
        F.lit(3).cast("long").alias("_version"))

    out = live.unionByName(retracted).unionByName(replaced)
    _TRANSFERS_CACHE[key] = out
    return out


# last-registered transfers view per session (same contract as
# tables._VIEWS_MEMO): skip the re-registration when it would replace
# the view with an identical plan.
_TRANSFERS_VIEW_MEMO: dict[str, tuple[str, str]] = {}


def with_transfers(spark: SparkSession, sf_dir: str,
                   view: str = "transfers") -> DataFrame:
    """Register the synthesized transfers as a temp view and return it."""
    df = transfers_df(spark, sf_dir)
    app = spark.sparkContext.applicationId
    if _TRANSFERS_VIEW_MEMO.get(app) != (sf_dir, view):
        df.createOrReplaceTempView(view)
        _TRANSFERS_VIEW_MEMO[app] = (sf_dir, view)
    return df


# DuckDB-dialect CTE producing the value-identical table from the same
# parquet `events` view. Every oracle_sql() entry that touches transfers
# is written as:  WITH {TRANSFERS_ORACLE_CTE} SELECT ...
TRANSFERS_ORACLE_CTE = f"""
transfers AS (
  WITH _ev AS (
    SELECT event_id, user_id,
           (CAST(floor(date_part('epoch', ts)) AS BIGINT) - {GENESIS_EPOCH})
             // {SECONDS_PER_BLOCK} AS blk_off
    FROM events
  ), _base AS (
    SELECT
      event_id,
      CAST({BLOCK0} + blk_off AS INTEGER) AS block_number,
      TIMESTAMP '2000-01-01 00:00:00'
        + INTERVAL 1 SECOND * (blk_off * {SECONDS_PER_BLOCK}) AS block_timestamp,
      CAST(event_id % 1000 AS INTEGER) AS log_index,
      '0x' || md5(concat('tx', CAST(event_id // 3 AS VARCHAR)))
           || md5(concat('tx2', CAST(event_id // 3 AS VARCHAR))) AS transaction_hash,
      '0x' || substr(md5(concat('f', CAST(user_id AS VARCHAR)))
                  || md5(concat('f2', CAST(user_id AS VARCHAR))), 1, 40) AS from_address,
      '0x' || substr(md5(concat('t', CAST(user_id * 31 + event_id % 7 AS VARCHAR)))
                  || md5(concat('t2', CAST(user_id * 31 + event_id % 7 AS VARCHAR))), 1, 40) AS to_address,
      CAST((event_id % 900 + 100) * (CASE CAST(event_id % 4 AS INTEGER)
             WHEN 0 THEN 100000 WHEN 1 THEN 1000000
             WHEN 2 THEN 10000000 ELSE 100000000 END) AS DECIMAL(38,0)) AS value
    FROM _ev
  ), _b2 AS (
    SELECT *,
           lpad(CAST(block_number AS VARCHAR), 10, '0') || '-' ||
           lpad(CAST(log_index AS VARCHAR), 6, '0') AS log_id
    FROM _base
  )
  SELECT log_id, block_number, block_timestamp, log_index, transaction_hash,
         from_address, to_address, value,
         1 AS _sign, CAST(1 AS BIGINT) AS _version
  FROM _b2
  UNION ALL
  SELECT log_id, block_number, block_timestamp, log_index, transaction_hash,
         from_address, to_address, value,
         -1 AS _sign, CAST(2 AS BIGINT) AS _version
  FROM _b2 WHERE event_id % {RETRACT_EVERY} = 0
  UNION ALL
  SELECT log_id, block_number, block_timestamp, log_index, transaction_hash,
         from_address, to_address,
         CAST(value * 2 AS DECIMAL(38,0)) AS value,
         1 AS _sign, CAST(3 AS BIGINT) AS _version
  FROM _b2 WHERE event_id % {RETRACT_EVERY} = 0
)
""".strip()
