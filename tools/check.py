#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs each oracle_sql.json query in DuckDB over the same sf dir and
compares to the parquet Verify dumped: column names (sorted), row
count, and a hash of the sorted row values (floats rounded to 9
significant-ish decimals to emulate a tolerant driver — we aim for
bit-exact anyway and report max float deltas).
"""
import sys, json, math
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails.append(name)
        continue
    try:
        got = pd.read_parquet(f"{outdir}/{name}")
    except Exception as e:
        print(f"FAIL {name}: spark result missing: {e}")
        fails.append(name)
        continue
    ec, gc = sorted(exp.columns), sorted(got.columns)
    if ec != gc:
        print(f"FAIL {name}: columns exp={ec} got={gc}")
        fails.append(name)
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        fails.append(name)
        continue
    e, g = canon(exp), canon(got)
    bad = False
    maxdelta = 0.0
    for c in e.columns:
        ev, gv = e[c], g[c]
        if ev.dtype.kind == 'f' or gv.dtype.kind == 'f':
            ev = ev.astype(float); gv = gv.astype(float)
            delta = (ev - gv).abs().max()
            if not (ev.equals(gv)):
                nd = float(delta) if not math.isnan(delta) else 0.0
                maxdelta = max(maxdelta, nd)
                if nd > 0:
                    bad = True
                    print(f"  {name}.{c}: max float delta {nd}")
        else:
            if not ev.astype(str).equals(gv.astype(str)):
                bad = True
                diff = (ev.astype(str) != gv.astype(str))
                i = diff.idxmax()
                print(f"  {name}.{c}: first diff at row {i}: exp={ev[i]} got={gv[i]}")
    if bad:
        print(f"FAIL {name}: value mismatch (max float delta {maxdelta})")
        fails.append(name)
    else:
        print(f"OK   {name}: {len(exp)} rows")

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
