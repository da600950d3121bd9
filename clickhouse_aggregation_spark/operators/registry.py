"""Declared-query registry: the single source of truth behind
``__spark_entry__.queries()`` / ``oracle_sql()`` and the test suite.

Every operator from SURVEY.md §2 that is implemented gets a
``QuerySpec`` here: a Spark callable ``(spark, sf_dir) -> DataFrame``
plus (when SQL-expressible) the equivalent DuckDB SQL the driver runs
as the correctness oracle. Column names are aliased identically on both
sides — the driver's compare sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .contract import finalize, wrap_oracle
from .contracts import CONTRACTS

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery              # finalized: output passed through the contract
    oracle: str | None          # full DuckDB SQL (contract-wrapped), or None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())
    raw_fn: SparkQuery = None   # pre-contract callable (for plan inspection)
    raw_oracle: str | None = None


REGISTRY: dict[str, QuerySpec] = {}

# The driver's correctness gate checks (at most) the first 50 declared
# queries, so ordering is part of the contract: oracle-paired queries
# must occupy the checked slots. DEMOTED entries are intentionally
# placed last — they stay fully usable/declared but their driver row is
# sacrificed first if the harness truncates:
#   * orders_priority_by_month / sql_adhoc_daily_volume duplicate
#     coverage that other checked queries already provide (F5 month-key
#     is unit-tested; the SQL-text surface is checked via
#     sql_adhoc_whale_report, the result via readme_daily_volume_7d),
#   * the rest are rows-only by design (sketch estimates, mapInPandas-
#     free iterative fixpoint) and carry the weakest driver signal.
DEMOTED: tuple[str, ...] = (
    "orders_priority_by_month",
    "sql_adhoc_daily_volume",
    "mv_usdc_hourly_block_approx",
    "events_value_quantiles",
    "dedup_clusters",
)


def declared_order() -> list[str]:
    """Registry names, oracle-paired first, demoted entries last."""
    paired = [n for n, s in REGISTRY.items()
              if s.oracle is not None and n not in DEMOTED]
    rows_only = [n for n, s in REGISTRY.items()
                 if s.oracle is None and n not in DEMOTED]
    demoted = [n for n in DEMOTED if n in REGISTRY]
    return paired + rows_only + demoted


def register(name: str, oracle: str | None = None, doc: str = "",
             tags: tuple[str, ...] = ()) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: add a declared query to the registry.

    The stored ``fn``/``oracle`` are wrapped with the output contract
    (contract.py): identical final-projection casts on the Spark side
    (schema-driven, at call time) and the oracle side (from the
    generated ``contracts.py``), so both engines hand the driver
    byte-comparable pandas frames.
    """
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def finalized(spark: SparkSession, sf_dir: str,
                      _fn: SparkQuery = fn) -> DataFrame:
            return finalize(_fn(spark, sf_dir))

        wrapped = wrap_oracle(oracle, CONTRACTS.get(name, {})) \
            if oracle is not None else None
        REGISTRY[name] = QuerySpec(name, finalized, wrapped, doc, tags,
                                   raw_fn=fn, raw_oracle=oracle)
        return fn
    return deco
