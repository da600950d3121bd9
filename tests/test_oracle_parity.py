"""The local mirror of the driver's t2 gate: every registry entry with
an oracle must hash-match DuckDB on the same parquet."""

from __future__ import annotations

import pytest

from clickhouse_aggregation_spark.operators import REGISTRY
from .oracle import compare

_ORACLE_SPECS = [s for s in REGISTRY.values() if s.oracle is not None]
_ROWS_ONLY_SPECS = [s for s in REGISTRY.values() if s.oracle is None]


@pytest.mark.parametrize("spec", _ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_parity_smoke(spark, sf_dir, spec):
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir, spec.name)


@pytest.mark.parametrize("spec", _ROWS_ONLY_SPECS, ids=lambda s: s.name)
def test_rows_only_queries_run(spark, sf_dir, spec):
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.slow
@pytest.mark.parametrize("spec", _ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_parity_sf001(spark, sf_oracle_dir, spec):
    """Same comparison at sf0.01 — the scale the driver actually gates on."""
    compare(spec.fn(spark, sf_oracle_dir), spec.oracle, sf_oracle_dir, spec.name)
