#!/usr/bin/env python3
"""Driver-simulation: run each oracle SQL in DuckDB against the same
testdata tables and compare with the Spark result parquet (column-name
sorted, row-sorted, value-normalized hash)."""
import duckdb, json, sys, glob, os
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = []
for name in sorted(oracle):
    try:
        want = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"duckdb error: {str(e)[:200]}")); continue
    pdir = f"{outdir}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    w, g = norm(want), norm(got)
    if list(w.columns) != list(g.columns):
        fails.append((name, f"schema: want {list(w.columns)} got {list(g.columns)}")); continue
    if len(w) != len(g):
        fails.append((name, f"rows: want {len(w)} got {len(g)}")); continue
    try:
        pd.testing.assert_frame_equal(w, g, check_dtype=False, check_exact=False, rtol=1e-9)
        print(f"OK   {name} ({len(g)} rows)")
    except AssertionError as e:
        fails.append((name, "values: " + str(e).split("\n")[0][:150]))
for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracles match")
