"""Simulate the driver: load __spark_entry__ by path, smoke entry(), run every
queries() entry at sf0.01, hash-compare against oracle_sql() via DuckDB."""
import importlib.util, sys, hashlib
sys.path.insert(0, "/root/repo")
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)

from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.sql.legacy.parquet.nanosAsLong","true")
         .config("spark.ui.enabled","false").getOrCreate())

rows = mod.entry(spark).collect()
print(f"entry(): {len(rows)} rows, first={rows[0]}")

import duckdb, pandas as pd
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"create view {t} as select * from read_parquet('{sf}/{t}.parquet')")

def h(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].where(df[c].notna(), None).map(lambda v: 'NULL' if v is None else str(v))
    vals = sorted(map(tuple, df.values.tolist()))
    return hashlib.md5(str(vals).encode()).hexdigest()[:12]

qs, oracles = mod.queries(), mod.oracle_sql()
# optional substring filters: `python tools/driver_sim.py geo_ sql_view`
pats = sys.argv[1:]
if pats:
    qs = {n: f for n, f in qs.items() if any(p in n for p in pats)}
bad = []
for name, fn in sorted(qs.items()):
    sdf = fn(spark, sf).toPandas()
    if name in oracles:
        odf = con.sql(oracles[name]).df()
        # normalize datetimelike to date-or-ts strings like tests/oracle_harness
        for d in (sdf, odf):
            for c in d.columns:
                if pd.api.types.is_datetime64_any_dtype(d[c]):
                    nn = d[c].dropna()
                    fmt = "%Y-%m-%d" if len(nn) and (nn.dt.normalize()==nn).all() else "%Y-%m-%d %H:%M:%S.%f"
                    d[c] = d[c].dt.strftime(fmt).where(d[c].notna(), None)
                elif d[c].dtype == object:
                    d[c] = d[c].map(lambda v: v.strftime("%Y-%m-%d") if hasattr(v,"strftime") else v)
                elif pd.api.types.is_float_dtype(d[c]):
                    d[c] = d[c].round(9)
                elif pd.api.types.is_integer_dtype(d[c]):
                    d[c] = d[c].astype("Int64")
        ok = h(sdf)==h(odf) and len(sdf)==len(odf)
        print(f"{'OK ' if ok else 'MISMATCH'} {name}: rows={len(sdf)} hash={h(sdf)}")
        if not ok: bad.append(name)
    else:
        print(f"rows-only {name}: rows={len(sdf)}")
print("MISMATCHES:", bad or "none")
sys.exit(1 if bad else 0)
