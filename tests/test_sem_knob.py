"""The SemDeDup cell-count knob: K derives from corpus size via the
SAME integer formula on both engines (K = max(16, n // 512)), the
static oracle self-parameterizes from a count(*) scalar subquery, and
K clamps to the shared IVF quantizer's 16 cells at every driver scale
factor (n <= 8192) so all previously pinned numbers are invariant by
construction. Measured motivation: at fixed K=16 the sf0.5->sf1.0
doubling exponent of dedup_semantic was 1.74 (in-cell pairs ~ n^2/K);
with K ~ n the same ratio is linear."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clickhouse_aggregation_spark.operators.similarity import (
    N_CENTROIDS, SEM_TARGET_CELL, sem_centroids_sql, sem_n_centroids,
)


def test_python_and_sql_k_formula_agree():
    """Pure integer floor division on both engines — checked at the
    clamp boundary and beyond."""
    con = duckdb.connect()
    scalar = sem_centroids_sql().replace("FROM embeddings", "FROM t") \
        .replace("count(*)", "n")
    for n in [1, 500, 2000, 8191, 8192, 8193, 9000, 10000, 16384,
              20000, 100000, 10**7]:
        con.execute("CREATE OR REPLACE TABLE t AS SELECT ? AS n", [n])
        got_sql = con.execute(f"SELECT {scalar}").fetchone()[0]
        assert got_sql == sem_n_centroids(n), n
    con.close()


def test_k_clamps_at_driver_scales_and_grows_linearly():
    # every driver fixture (500, 2000) and anything <= 16*512 keeps
    # the shared 16-cell quantizer -> pinned numbers cannot move
    assert sem_n_centroids(500) == N_CENTROIDS
    assert sem_n_centroids(2000) == N_CENTROIDS
    assert sem_n_centroids(16 * SEM_TARGET_CELL) == N_CENTROIDS
    # beyond the clamp K ~ n: cell size (n/K) stays ~SEM_TARGET_CELL
    for n in [10000, 20000, 10**6]:
        k = sem_n_centroids(n)
        assert k == n // SEM_TARGET_CELL
        assert n / k <= 2 * SEM_TARGET_CELL


def _synth_sf_dir(tmp_path, n, dim=64, seed=11):
    """Synthetic embeddings with planted near-dup pairs (the SemDeDup
    prune targets) big enough to push K past the clamp."""
    rng = np.random.default_rng(seed)
    vecs = rng.uniform(-1.0, 1.0, size=(n, dim)).astype(np.float32)
    for i in range(0, 20, 2):
        vecs[i + 1] = (vecs[i] * 0.95
                       + rng.uniform(-0.05, 0.05, dim)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([i % 4 for i in range(n)], pa.int32()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "embeddings.parquet"))
    return str(tmp_path)


@pytest.mark.slow
def test_sem_oracle_parity_with_grown_k(spark, tmp_path):
    """END-TO-END knob check: at n = 9000 both engines must derive
    K = 17 from the data and produce identical per-cell stats — the
    declared query stays hash-checked at any scale without
    regenerating the oracle."""
    from clickhouse_aggregation_spark.operators.registry import REGISTRY
    from tests.oracle import compare

    n = 9000
    assert sem_n_centroids(n) == 17 > N_CENTROIDS
    sf = _synth_sf_dir(tmp_path, n)
    spec = REGISTRY["dedup_semantic"]
    df = spec.fn(spark, sf)
    # the K-grown assignment really uses 17 cells
    assert df.count() == 17
    compare(df, spec.oracle, sf, "sem_knob_k17")
