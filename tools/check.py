#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each Verify output
parquet, run the matching oracle SQL in DuckDB over the same sf dir, and
compare (column names sorted, rows sorted, values normalized). Dev-only —
the library itself never depends on this."""
import sys, json, glob, math, os
from decimal import Decimal
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if v is None: return None
    if isinstance(v, Decimal): return ("num", float(v))
    if isinstance(v, float):
        if math.isnan(v): return ("nan",)
        return ("num", round(v, 9))
    if isinstance(v, int): return ("num", float(v))
    if hasattr(v, "isoformat"): return ("ts", v.isoformat()[:26])
    if isinstance(v, list): return tuple(norm(x) for x in v)
    return v

fails = 0
for name in sorted(oracle):
    qdir = f"{outdir}/{name}"
    if not os.path.isdir(qdir):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        spark_rows = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        scols = spark_rows.columns
        sdata = spark_rows.fetchall()
        duck = con.sql(oracle[name])
        dcols = duck.columns
        ddata = duck.fetchall()
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:200]}"); fails += 1; continue
    if sorted(map(str.lower, scols)) != sorted(map(str.lower, dcols)):
        print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
        fails += 1; continue
    sidx = sorted(range(len(scols)), key=lambda i: scols[i].lower())
    didx = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
    srows = sorted([tuple(norm(r[i]) for i in sidx) for r in sdata], key=repr)
    drows = sorted([tuple(norm(r[i]) for i in didx) for r in ddata], key=repr)
    if srows == drows:
        print(f"OK   {name} ({len(srows)} rows)")
    else:
        fails += 1
        print(f"FAIL {name}: spark {len(srows)} rows vs duck {len(drows)}")
        for a, b in list(zip(srows, drows))[:200]:
            if a != b:
                print(f"  spark: {a}\n  duck : {b}")
                break
        only_s = [r for r in srows if r not in set(map(tuple, drows))][:2]
        only_d = [r for r in drows if r not in set(map(tuple, srows))][:2]
        if only_s: print(f"  only-spark: {only_s}")
        if only_d: print(f"  only-duck : {only_d}")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
