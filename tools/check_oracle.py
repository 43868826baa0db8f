#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: for each query
output parquet under OUTDIR, run the matching oracle SQL from
oracle_sql.json in DuckDB over the sf tables, and compare sorted rows.

Usage: python3 tools/check_oracle.py <sfDir> <outDir> [q1,q2,...]
The optional third arg restricts the check to those queries (matching
Verify's own query-list arg for targeted runs).
"""
import json
import math
import sys

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)

fails = 0
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    try:
        got_rel = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        got_cols = [d[0].lower() for d in got_rel.description]
        got = got_rel.fetchall()
        exp_rel = con.execute(sql)
        exp_cols = [d[0].lower() for d in exp_rel.description]
        exp = exp_rel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: exec error: {str(e)[:200]}")
        fails += 1
        continue
    if sorted(got_cols) != sorted(exp_cols):
        print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
        fails += 1
        continue
    g, e = canon(got, got_cols), canon(exp, exp_cols)
    if g == e:
        print(f"OK   {name}: {len(g)} rows")
    else:
        fails += 1
        print(f"FAIL {name}: {len(g)} vs {len(e)} rows")
        for i, (a, b) in enumerate(zip(g, e)):
            if a != b:
                print(f"  first diff at {i}:\n    got {a}\n    exp {b}")
                break
        else:
            print(f"  row-count mismatch only; got[:2]={g[:2]} exp[:2]={e[:2]}")
print("RESULT:", "ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
