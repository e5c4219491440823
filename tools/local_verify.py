#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same parquet tables and compare
(columns sorted by name, rows sorted, exact value compare).
Driver-side tooling only — NOT part of the library."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
# bound DuckDB so a heavy oracle (recursive closures, 128-hash chains
# at 10x) spills to disk instead of OOM-killing the gate
con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '48GB')}'")
con.execute("SET threads=16")
con.execute("SET temp_directory='/tmp/duckdb_spill'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # driver testdata is one file per table; graft.ScaleUp output is a
    # Spark-written DIRECTORY named <t>.parquet — glob its part files
    path = f"{sf_dir}/{t}.parquet"
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

fails = 0
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    got = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{path}/*.parquet")])
    if name not in oracle:
        print(f"  [rows-only] {name}: {len(got)} rows")
        continue
    # one oracle blowing past the memory limit (not every DuckDB
    # operator can spill) must fail ITS row, not kill the sweep
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as ex:
        print(f"FAIL {name}: oracle error: {str(ex).splitlines()[0][:160]}")
        fails += 1
        continue
    g, e = canon(got), canon(exp)
    ok = True
    if list(g.columns) != list(e.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}"); ok = False
    elif len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); ok = False
    else:
        for c in g.columns:
            gv, ev = g[c].astype(str).values, e[c].astype(str).values
            bad = [(i, gv[i], ev[i]) for i in range(len(gv)) if gv[i] != ev[i]]
            if bad:
                print(f"FAIL {name}.{c}: {len(bad)} diffs, first: {bad[:3]}")
                print(f"  dtypes: got={g[c].dtype} exp={e[c].dtype}")
                ok = False
    if ok:
        print(f"  [ok] {name}: {len(g)} rows")
    else:
        fails += 1
# an entry whose Spark dump FAILED leaves no directory — without this
# check a crashed query silently vanishes from the report (the driver's
# gate records err per queries key; mimic that)
dumped = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
attempted_path = os.path.join(out_dir, "attempted.json")
attempted = set(json.load(open(attempted_path))) if os.path.exists(attempted_path) \
    else set(oracle)
for name in sorted(attempted - dumped):
    print(f"FAIL {name}: no Spark dump (query failed at Verify time?)")
    fails += 1
print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
