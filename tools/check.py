#!/usr/bin/env python3
"""Local replica of the driver's correctness gate — STRICT, no value
normalization (the round-1 version normalized Decimal->float and rounded,
which hid 16 driver hash failures).

Two comparison channels, BOTH must match for an OK:

  typed  : Spark output parquet via pyarrow .to_pylist()  vs  DuckDB
           fetchall().  Exact python values, type-preserving (Decimal
           stays Decimal, int stays int).
  pandas : both sides rendered through pandas + str().  This reproduces
           readers that coerce DuckDB HUGEINT / DECIMAL to float64 —
           the channel where `sum(int)` (HUGEINT -> "57059.0") diverges
           from Spark's BIGINT ("57059") even though the python values
           are equal.  Canonicalize aggregate types on both sides
           (CAST ... AS BIGINT / DOUBLE) so this channel agrees.

Dev-only — the library itself never depends on this."""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

# --fanout: run every query's compare in its OWN subprocess. A large-sf
# brute-force oracle can exceed the machine (the r10 sf0.1 sweep's q121
# replay peaked >100 GB and the OOM killer took the whole gate with it —
# 32 queries in, no summary, exit untraceable); per-query isolation turns
# that into one recorded FAIL and a sweep that finishes. Inherits
# GRAFT_DUCK_MEM / GRAFT_ORACLE_TIMEOUT per child.
if "--fanout" in sys.argv:
    import subprocess
    names = sorted(json.load(open(f"{outdir}/oracle_sql.json")))
    fails = 0
    for name in names:
        env = dict(os.environ, GRAFT_CHECK_ONLY=name)
        try:
            # Child wall-clock = oracle budget * 1.5 + a fixed setup
            # allowance: the child also loads views and runs the Spark-
            # output compare, so without the headroom a slow-loading
            # large-sf child gets killed and mis-reported as
            # FAIL(timeout) even though the ORACLE stayed within its
            # DuckDB interrupt budget.
            tmo = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0") or 0)
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), sfdir, outdir],
                env=env, capture_output=True, text=True,
                timeout=(tmo * 1.5 + 120) if tmo else None)
            line = next((l for l in r.stdout.splitlines()
                         if l.startswith(("OK", "FAIL"))), None)
            if line is None:
                print(f"FAIL {name}: child died rc={r.returncode} "
                      f"(likely OOM-killed)"); fails += 1
            else:
                print(line)
                if line.startswith("FAIL"):
                    fails += 1
                    for l in r.stdout.splitlines()[1:6]:
                        print(l)
        except subprocess.TimeoutExpired:
            print(f"FAIL {name}: child wall-clock timeout"); fails += 1
        sys.stdout.flush()
    print(f"\n{len(names) - fails}/{len(names)} queries match")
    sys.exit(1 if fails else 0)

con = duckdb.connect()
# Large-sf runs (the one-off sf0.1 oracle sweep): cap DuckDB's memory and
# let it spill, so a token-stream-sized oracle intermediate degrades to
# disk instead of an OOM kill of the whole gate. No effect unless set.
if os.environ.get("GRAFT_DUCK_MEM"):
    con.sql(f"SET memory_limit='{os.environ['GRAFT_DUCK_MEM']}'")
    con.sql("SET temp_directory='/tmp/duckspill'")
    con.sql("SET preserve_insertion_order=false")
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    # ScaleUp-generated tables are Spark output DIRECTORIES of part files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))


def sorted_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return sorted([tuple(r[i] for i in idx) for r in rows], key=repr)


def render(v):
    # NaN-safe str() that distinguishes 57059 from 57059.0 and
    # Decimal('1.40') from 1.4 — the strictness the driver has.
    return "NULL" if v is None else f"{type(v).__name__}:{v}"


only = os.environ.get("GRAFT_CHECK_ONLY")
fails = 0
for name in sorted(oracle):
    if only and name not in only.split(","):
        continue
    qdir = f"{outdir}/{name}"
    if not os.path.isdir(qdir):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        st = pq.read_table(qdir)
        scols = st.column_names
        sdata = [tuple(row[c] for c in scols) for row in st.to_pylist()]
        # GRAFT_ORACLE_TIMEOUT=<sec>: per-ORACLE bound for the large-sf
        # sweeps — a timer thread interrupts DuckDB so one pathological
        # oracle (always the brute-force truth's cost, never the
        # engine's) degrades to a recorded FAIL(timeout) instead of
        # stalling the whole sweep. Unset (the driver's gate): no bound.
        tmo = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0") or 0)
        timer = None
        if tmo > 0:
            import threading
            timer = threading.Timer(tmo, con.interrupt)
            timer.start()
        try:
            duck = con.sql(oracle[name])
            dcols = duck.columns
            ddata = duck.fetchall()
            duck_df = con.sql(oracle[name]).df()
        finally:
            if timer is not None:
                timer.cancel()
        spark_df = st.to_pandas()
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:200]}"); fails += 1; continue
    if sorted(map(str.lower, scols)) != sorted(map(str.lower, dcols)):
        print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
        fails += 1; continue

    srows = sorted_rows(scols, sdata)
    drows = sorted_rows(dcols, ddata)
    typed_ok = [tuple(map(render, r)) for r in srows] == \
               [tuple(map(render, r)) for r in drows]

    sp = sorted_rows(scols, [tuple(x) for x in spark_df.itertuples(index=False)])
    dp = sorted_rows(dcols, [tuple(x) for x in duck_df.itertuples(index=False)])
    pandas_ok = [tuple(map(render, r)) for r in sp] == \
                [tuple(map(render, r)) for r in dp]

    if typed_ok and pandas_ok:
        print(f"OK   {name} ({len(srows)} rows)")
        continue
    fails += 1
    chan = "typed" if not typed_ok else "pandas"
    print(f"FAIL {name} [{chan}]: spark {len(srows)} rows vs duck {len(drows)}")
    pairs = zip(srows, drows) if not typed_ok else zip(sp, dp)
    for a, b in list(pairs)[:500]:
        ra, rb = tuple(map(render, a)), tuple(map(render, b))
        if ra != rb:
            print(f"  spark: {ra}\n  duck : {rb}")
            break
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
