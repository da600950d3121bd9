from __future__ import annotations

import os

from clickhouse_aggregation_spark.plans.monitoring import (
    catalog_tables, streaming_progress, table_sizes,
)
from clickhouse_aggregation_spark.sources.tables import register_views


def test_table_sizes_readable(spark, sf_dir):
    paths = {n: os.path.join(sf_dir, f"{n}.parquet")
             for n in ("region", "lineitem", "documents")}
    out = table_sizes(spark, paths).collect()
    assert len(out) == 3
    assert out[0]["total_bytes"] >= out[-1]["total_bytes"]
    for r in out:
        assert r["size"].split(" ")[1] in ("B", "KiB", "MiB", "GiB")
        assert r["n_rows"] > 0


def test_catalog_tables_lists_views(spark, sf_dir):
    register_views(spark, sf_dir)
    names = {r["name"] for r in catalog_tables(spark).collect()}
    assert {"region", "nation", "lineitem", "events"} <= names


def test_streaming_progress_shape(spark, sf_dir, tmp_path):
    from clickhouse_aggregation_spark.streaming.maintainer import (
        run_maintainer_stream, INCREMENTAL_ROLLUPS,
    )
    from clickhouse_aggregation_spark.sources.transfers import transfers_df
    tdir = str(tmp_path / "t")
    transfers_df(spark, sf_dir).coalesce(1).write.parquet(tdir)
    q = run_maintainer_stream(spark, tdir, str(tmp_path / "store"),
                              rollups=INCREMENTAL_ROLLUPS[:1])
    q.awaitTermination(60)
    p = streaming_progress(q)
    assert p["numInputRows"] > 0
    assert "durationMs" in p
