"""Output-representation contract for declared queries.

The driver's correctness gate collects a Spark result via ``toPandas()``
and a DuckDB-oracle result via ``.df()`` and hash-compares raw cell
representations. The two engines disagree on how exact types cross the
pandas boundary:

* Spark DECIMAL(p,s) -> ``decimal.Decimal`` objects; DuckDB DECIMAL ->
  ``float64`` (so ``Decimal('1.2000')`` vs ``1.2`` hash-differ even
  though the values are equal),
* Spark DATE -> ``datetime.date``; DuckDB DATE -> ``datetime64``
  (midnight timestamps).

TIMESTAMP columns round-trip identically on both engines (verified:
round-1 driver gate passed every timestamp-bearing query whose numerics
were safe), as do BIGINT, DOUBLE and VARCHAR. So every declared query
projects its FINAL output through this contract:

* DECIMAL(p, 0)   -> BIGINT  (exact: integral sums fit int64 at any
                    bench scale; Spark ANSI mode would fail loudly on
                    overflow rather than corrupt),
* DECIMAL(p, s>0) -> DOUBLE  (deterministic: both engines round the
                    same exact decimal to the nearest double),
* DATE            -> TIMESTAMP (midnight; matches DuckDB's own DATE
                    representation in pandas),
* FLOAT           -> DOUBLE  (width-normalize).

Aggregation stays DECIMAL-exact internally — only the last projection
changes, so plans, shuffles and semantics are untouched. The oracle SQL
gets the *same* casts via ``SELECT * REPLACE`` over the original text,
driven by the generated per-query contract in ``contracts.py``
(regenerate with ``python tools/gen_contracts.py`` after changing any
declared query's output schema; ``tests/test_contracts.py`` asserts the
stored contracts match the live schemas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

# kind -> (spark cast type, duckdb cast type)
KINDS = {
    "i64": ("long", "BIGINT"),
    "f64": ("double", "DOUBLE"),
    "ts": ("timestamp", "TIMESTAMP"),
}

# Output types that survive the pandas boundary identically on both
# engines without help.
_SAFE_TYPES = (T.StringType, T.LongType, T.IntegerType, T.ShortType,
               T.ByteType, T.DoubleType, T.BooleanType, T.TimestampType,
               T.TimestampNTZType, T.BinaryType)


def kind_of(dt: T.DataType) -> str | None:
    """Contract kind a column of this type must be cast to (None = safe
    as-is)."""
    if isinstance(dt, T.DecimalType):
        return "i64" if dt.scale == 0 else "f64"
    if isinstance(dt, T.DateType):
        return "ts"
    if isinstance(dt, T.FloatType):
        return "f64"
    return None


def derive_contract(schema: T.StructType) -> dict[str, str]:
    """Column -> kind for every column that needs a contract cast."""
    out: dict[str, str] = {}
    for f in schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            raise TypeError(
                f"declared-query output column {f.name!r} is "
                f"{f.dataType.simpleString()} — complex types are not "
                "hashable by the driver; project scalars instead")
        k = kind_of(f.dataType)
        if k:
            out[f.name] = k
        elif not isinstance(f.dataType, _SAFE_TYPES):
            raise TypeError(
                f"declared-query output column {f.name!r} has unhandled "
                f"type {f.dataType.simpleString()}")
    return out


def finalize(df: DataFrame) -> DataFrame:
    """Apply the contract casts to a Spark result (no-op when the
    schema is already boundary-safe)."""
    contract = derive_contract(df.schema)
    if not contract:
        return df
    return df.select(*[
        F.col(f.name).cast(KINDS[contract[f.name]][0]).alias(f.name)
        if f.name in contract else F.col(f.name)
        for f in df.schema.fields
    ])


def wrap_oracle(sql: str, contract: dict[str, str]) -> str:
    """Apply the identical casts to the DuckDB oracle text."""
    if not contract:
        return sql
    repl = ", ".join(
        f'CAST("{col}" AS {KINDS[kind][1]}) AS "{col}"'
        for col, kind in contract.items())
    return f"SELECT * REPLACE ({repl}) FROM (\n{sql}\n) __contract"
