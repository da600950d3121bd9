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

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None          # full DuckDB SQL, or None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = "",
             tags: tuple[str, ...] = ()) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: add a declared query to the registry."""
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc, tags)
        return fn
    return deco
