"""Misc scalar functions (SURVEY.md §2.8 F2, F8).

All native Column expressions — no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_UNITS = ("B", "KiB", "MiB", "GiB", "TiB", "PiB")


def multi_if(*branches, default) -> Column:
    """ClickHouse ``multiIf(c1, v1, c2, v2, ..., default)`` as chained
    ``when`` (reference: usdc-transfers/sql/analytics.sql:77-82)."""
    assert len(branches) % 2 == 0 and branches, "multi_if needs (cond, value) pairs"
    pairs = list(zip(branches[::2], branches[1::2]))
    col = F.when(pairs[0][0], pairs[0][1])
    for cond, val in pairs[1:]:
        col = col.when(cond, val)
    return col.otherwise(default)


def validate_enum(col: Column, allowed: tuple[str, ...],
                  name: str = "enum") -> Column:
    """String-valued enum with CHECK-style validation (SURVEY.md §2.8
    F12; reference marshal.enumFromJson, src/model/generated/
    marshal.ts:130-135): passes allowed values through, fails the job
    with a descriptive error on anything else (the Spark analog of the
    marshal layer throwing on an invalid enum)."""
    return (
        F.when(col.isin(*allowed), col)
        .otherwise(F.raise_error(F.concat(
            F.lit(f"invalid {name} value: '"), col,
            F.lit(f"' (allowed: {', '.join(allowed)})"))))
    )


def format_readable_size(bytes_col: Column) -> Column:
    """ClickHouse ``formatReadableSize`` (reference:
    usdc-transfers/sql/monitoring.sql:24): '1.21 MiB' style, base-1024.

    Monitoring nicety — built from when-chains so it stays JVM-side.
    """
    b = bytes_col.cast("double")
    col = None
    for i, unit in enumerate(_UNITS):
        scale = float(1024 ** i)
        cond = b < float(1024 ** (i + 1)) if i < len(_UNITS) - 1 else F.lit(True)
        val = F.concat(F.format_number(b / scale, 2), F.lit(f" {unit}"))
        col = F.when(cond, val) if col is None else col.when(cond, val)
    return col
