"""Driver-contract simulator: vanilla session + DuckDB views + per-query
rows/schema/hash compare — the local replica of the driver's
CORRECTNESS gate. Usage: python tools/driver_sim.py [query ...]
(no args = all 50). SIM_SF env switches scale factor (default 0.01).
Run from a cwd OUTSIDE the repo to catch worker-import failures for
pickled mapInPandas functions."""
import hashlib
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import duckdb
from pyspark.sql import SparkSession

SF = os.environ.get("SIM_SF", "0.01")
SF_DIR = f"/root/testdata/sf{SF}"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
import __spark_entry__ as m

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(str(r[i]) for i in order))
    return sorted(cols), sorted(out)


names = sys.argv[1:] or list(m.queries().keys())
qs, oracles = m.queries(), m.oracle_sql()
# local-only extras registry resolves too (rotated-out + chunk/caps
# oracles): named explicitly, or all of them via "extras"
if names == ["extras"]:
    names = list(m.extra_queries().keys())
qs = {**m.extra_queries(), **qs}
oracles = {**m.extra_oracle_sql(), **oracles}
fails = []
for name in names:
    try:
        sdf = qs[name](spark, SF_DIR)
        scols = sdf.columns
        srows = [[v for v in row] for row in sdf.collect()]
        if name not in oracles:
            print(f"{name}: rows={len(srows)} (no oracle)")
            continue
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        sc, sr = canon(scols, srows)
        oc, orr = canon(ocols, orows)
        ok_rows = len(sr) == len(orr)
        ok_schema = sc == oc
        h = lambda rs: hashlib.sha256("\n".join("|".join(r) for r in rs).encode()).hexdigest()[:12]
        ok_hash = h(sr) == h(orr)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            fails.append(name)
        print(f"{name}: {status} rows={len(sr)}/{len(orr)} schema={ok_schema} hash={ok_hash}")
        if status == "FAIL" and not ok_schema:
            print(f"  spark cols: {sc}\n  oracle cols: {oc}")
        if status == "FAIL" and ok_schema and len(sr) and len(orr):
            for a, b in zip(sr, orr):
                if a != b:
                    print(f"  first diff:\n   spark : {a}\n   oracle: {b}")
                    break
    except Exception as e:
        fails.append(name)
        print(f"{name}: ERROR {type(e).__name__}: {str(e)[:300]}")

print(f"\n{len(names) - len(fails)}/{len(names)} ok; fails: {fails}")
sys.exit(1 if fails else 0)
