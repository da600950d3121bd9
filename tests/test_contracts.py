"""Guards on the output-representation contract (operators/contract.py).

1. The generated contracts.py must match what the live raw schemas
   derive — catches 'edited a query, forgot to regenerate'.
2. No declared query may emit complex-typed (array/map/struct) output:
   the driver's canonicalizer cannot hash such cells (round-1 lesson:
   events_value_quantiles crashed the external gate).
3. Finalized outputs contain only boundary-safe types.
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from clickhouse_aggregation_spark.operators import REGISTRY
from clickhouse_aggregation_spark.operators.contract import (
    derive_contract, kind_of,
)
from clickhouse_aggregation_spark.operators.contracts import CONTRACTS

_SPECS = list(REGISTRY.values())


@pytest.mark.parametrize("spec", _SPECS, ids=lambda s: s.name)
def test_contract_matches_live_schema(spark, sf_dir, spec):
    derived = derive_contract(spec.raw_fn(spark, sf_dir).schema)
    stored = CONTRACTS.get(spec.name, {})
    assert derived == stored, (
        f"{spec.name}: contracts.py is stale (derived={derived}, "
        f"stored={stored}) — rerun tools/gen_contracts.py")


@pytest.mark.parametrize("spec", _SPECS, ids=lambda s: s.name)
def test_finalized_output_is_boundary_safe(spark, sf_dir, spec):
    for f in spec.fn(spark, sf_dir).schema.fields:
        assert not isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType)), (
            f"{spec.name}.{f.name}: complex type {f.dataType.simpleString()}")
        assert kind_of(f.dataType) is None, (
            f"{spec.name}.{f.name}: finalize left a contract-needing type "
            f"{f.dataType.simpleString()}")
