"""Simulate the driver: vanilla session, fresh import of __spark_entry__,
entry() smoke + queries()/oracle_sql() hash-compare at sf0.01 via DuckDB."""
import sys, hashlib, decimal, datetime, math
import duckdb, pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as mod

spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim").getOrCreate())   # NO engine confs on purpose

# 1. entry() smoke
df = mod.entry(spark)
rows = df.collect()
print("entry(): rows =", len(rows), "schema =", df.schema.simpleString())
assert len(rows) > 0

# 2. queries vs oracles at sf0.01
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(v):
    if v is None: return "null"
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return str(int(v)) if v == int(v) and abs(v) < 1e15 else f"{v:.9g}"
    if isinstance(v, decimal.Decimal):
        return str(int(v)) if v == v.to_integral_value() else f"{float(v):.9g}"
    if isinstance(v, pd.Timestamp): return v.isoformat()
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return v.isoformat() + "T00:00:00"
    if hasattr(v, "isoformat"): return v.isoformat()
    return str(v)

def vhash(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(tuple(norm(v) for v in r) for r in pdf[cols].itertuples(index=False, name=None))
    return hashlib.md5(repr(rows).encode()).hexdigest()

qs, os_ = mod.queries(), mod.oracle_sql()
ok = bad = weak = 0
for name, fn in qs.items():
    spdf = fn(spark, SF).toPandas()
    if name not in os_:
        print(f"  rows-only {name}: {len(spdf)} rows"); weak += 1; continue
    ddf = con.execute(os_[name]).df()
    match = len(spdf) == len(ddf) and vhash(spdf) == vhash(ddf)
    print(f"  {'MATCH' if match else 'MISMATCH'} {name}: spark={len(spdf)} duckdb={len(ddf)}")
    ok += match; bad += (not match)
print(f"RESULT: {ok} match, {bad} mismatch, {weak} rows-only")
sys.exit(1 if bad else 0)
