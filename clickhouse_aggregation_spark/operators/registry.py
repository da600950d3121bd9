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
