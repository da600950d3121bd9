"""One-off probe: compare raw pandas dtypes + cell reprs between Spark
(vanilla driver-style session) and DuckDB for selected declared queries."""
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as mod

NAMES = sys.argv[1:] or [
    "tpch_q3_shipping_priority",   # passed r1
    "tpch_q10_returned_items",     # failed r1
    "mv_usdc_daily_ts",            # failed r1 (decimal + date)
    "monitoring_global_stats",     # failed r1 (decimal + ts)
]
SF = "/root/testdata/sf0.01"

spark = (SparkSession.builder.master("local[8]")
         .appName("dtype-probe").getOrCreate())
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs, os_ = mod.queries(), mod.oracle_sql()
for name in NAMES:
    print("=" * 70)
    print(name)
    spdf = qs[name](spark, SF).toPandas()
    ddf = con.execute(os_[name]).df()
    sp = spdf[sorted(spdf.columns)].sort_values(list(sorted(spdf.columns))).head(2)
    dd = ddf[sorted(ddf.columns)].sort_values(list(sorted(ddf.columns))).head(2)
    print("spark dtypes :", dict(spdf.dtypes.astype(str)))
    print("duckdb dtypes:", dict(ddf.dtypes.astype(str)))
    for label, frame in (("spark", sp), ("duckdb", dd)):
        for row in frame.itertuples(index=False, name=None):
            print(f"  {label}: " + " | ".join(f"{type(v).__name__}:{v!r}" for v in row))
