"""Driver simulation: imports __spark_entry__ from /root/repo like the real
driver would — plain default SparkSession, no engine session helper."""
import sys, os, math
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

# 1. smoke: entry() at sf0.001
df = e.entry(spark)
rows = df.collect()
print("ENTRY rows:", len(rows), "schema:", df.columns)
assert len(rows) > 0

# 2. oracle compare at sf0.01 (driver's gate)
sf = "/root/testdata/" + (sys.argv[1] if len(sys.argv) > 1 else "sf0.01")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(v):
    if isinstance(v, float):
        return round(v, 6)
    return v

qs, sqls = e.queries(), e.oracle_sql()
fails = 0
for name, fn in qs.items():
    sdf = fn(spark, sf)
    scols = sorted(sdf.columns)
    srows = sorted([tuple(canon(r[c]) for c in scols) for r in sdf.collect()], key=str)
    if name not in sqls:
        print(f"{name}: rows-only, n={len(srows)}")
        continue
    rel = con.execute(sqls[name])
    dcols = sorted(c[0] for c in rel.description)
    draw = rel.fetchall()
    dmap = [c[0] for c in con.execute(sqls[name]).description]
    drows = sorted([tuple(canon(row[dmap.index(c)]) for c in dcols) for row in draw], key=str)
    ok = scols == dcols and srows == drows
    if not ok:
        fails += 1
        print(f"{name}: MISMATCH cols_ok={scols==dcols} n_spark={len(srows)} n_duck={len(drows)}")
        for a, b in zip(srows, drows):
            if a != b:
                print("  spark:", a); print("  duck :", b); break
    else:
        print(f"{name}: MATCH ({len(srows)} rows)")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
