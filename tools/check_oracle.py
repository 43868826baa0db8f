#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: for each query
output parquet under OUTDIR, run the matching oracle SQL from
oracle_sql.json in DuckDB over the sf tables, and compare sorted rows.

Usage: python3 tools/check_oracle.py <sfDir> <outDir> [q1,q2,...]
The optional third arg restricts the check to those queries (matching
Verify's own query-list arg for targeted runs).
"""
import glob
import json
import math
import os
import re
import sys

import duckdb

# `--selftest` pins the type-gate verdicts with no parquet/oracle needed
# (the r15 calibration probe, made permanent) — handled after the gate
# functions are defined below.
SELFTEST = len(sys.argv) > 1 and sys.argv[1] == "--selftest"

if not SELFTEST:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))

# Key symmetry: every dumped query result must have an oracle and vice
# versa — an orphaned side silently weakens the gate to a rows-only (or
# no) check for that name. Skipped under a targeted query list, where
# the dump is intentionally partial.
if not SELFTEST and only is None:
    dumped = {os.path.basename(d.rstrip("/"))
              for d in glob.glob(f"{outdir}/*/")}
    missing_oracle = sorted(dumped - set(oracle))
    missing_query = sorted(set(oracle) - dumped)
    if missing_oracle or missing_query:
        print(f"FAIL <symmetry>: queries without oracle {missing_oracle}; "
              f"oracles without dumped query {missing_query}")
        sys.exit(1)

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

# DuckDB types with no Spark/parquet twin: the driver's hash is
# type-sensitive, so an oracle column of one of these ALWAYS hash-diverges
# even when every value is identical (the round-13 246/250 failure mode —
# an uncast sum() widened to HUGEINT before a `//`). Exact base-type
# match: "TIME" must not catch "TIMESTAMP".
BANNED_TYPES = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT",
                "UTINYINT", "INT128", "TIME", "INTERVAL", "BIT", "UUID"}

def is_banned(t):
    """Word-level scan of the FULL type string, so a banned type nested
    inside STRUCT(...)/MAP(...)/list types is still caught (a struct
    field's HUGEINT hash-diverges exactly like a top-level one). All
    TIMESTAMP spellings are collapsed first so neither the TIMESTAMP
    token nor the words of WITH TIME ZONE can trip the TIME ban."""
    s = re.sub(r"TIMESTAMP(_NS|_MS|_S)?( WITH TIME ZONE)?", "TS", t)
    return any(tok in BANNED_TYPES
               for tok in re.findall(r"[A-Z][A-Z_0-9]*", s))

# Hash-equivalence classes, calibrated against the driver's gate
# (CORRECTNESS_r13: INTEGER-vs-BIGINT and TIMESTAMP-vs-TIMESTAMPTZ pairs
# hash GREEN; HUGEINT-vs-BIGINT hashes RED): integer widths collapse, as
# do float widths and timestamp zone variants; everything else —
# including DECIMAL precision/scale and struct internals, which survive
# the substitution verbatim — must match exactly. A cross-CLASS
# divergence (int-vs-float, DECIMAL-vs-int) changes the hashed value
# representation and fails.
def hclass(t):
    s = re.sub(r"TIMESTAMP(_NS|_MS|_S)?( WITH TIME ZONE)?", "TS", t)
    s = re.sub(r"\b(TINYINT|SMALLINT|INTEGER|BIGINT)\b", "INT", s)
    s = re.sub(r"\b(FLOAT|DOUBLE)\b", "FLT", s)
    return s

def coltypes(rel_sql):
    """[(col_lower, type_upper)] via DESCRIBE, order-insensitive by name."""
    rows = con.execute(f"DESCRIBE {rel_sql}").fetchall()
    return sorted((r[0].lower(), r[1].upper()) for r in rows)

# OUTPUT-type precedent allowlist (the r14 lesson, stronger than the ban
# list above): a column may only cross the output edge in a type class
# with a prior driver-GREEN hash precedent. The r15 DESCRIBE sweep of all
# 250 green outputs shows exactly these RAW types ever shipped:
# BIGINT/INTEGER, DOUBLE, VARCHAR, TIMESTAMP (zone/precision variants are
# one driver-green class — r13's TIMESTAMP-vs-TIMESTAMPTZ pair), BOOLEAN,
# DATE. Anything else — DECIMAL (r14's only red row: bit-identical
# values, hash RED, Spark parquet decimal vs DuckDB int128),
# ARRAY/STRUCT/MAP, BLOB, and the UNSWEPT members of the green hash
# classes (FLOAT, TINYINT, SMALLINT never shipped top-level) — has NO
# precedent and must not ship until the hash_canary query has proven it
# green on the driver first. Checked on BOTH sides (the Spark parquet
# output and the oracle result), and on the RAW DESCRIBE token — checking
# after the hclass() collapse would wave FLOAT through as FLT and
# TINYINT/SMALLINT through as INT, exactly the r14
# bit-identical-value/hash-divergent class this gate exists to stop.
ALLOWED_OUTPUT_RAW = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN",
                      "DATE", "TS"}

def unprecedented(t):
    raw = re.sub(r"TIMESTAMP(_NS|_MS|_S)?( WITH TIME ZONE)?", "TS", t)
    return None if raw in ALLOWED_OUTPUT_RAW else raw

if SELFTEST:
    ok = [  # raw DESCRIBE tokens with a driver-GREEN hash precedent
        "BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN", "DATE",
        "TIMESTAMP", "TIMESTAMP WITH TIME ZONE", "TIMESTAMP_NS"]
    flag = [  # no precedent — including green-CLASS members that never
              # shipped raw (the r15 ADVICE finding: FLOAT and
              # TINYINT/SMALLINT collapse into green hclasses, so the
              # check must run on the raw token)
        "FLOAT", "TINYINT", "SMALLINT", "DECIMAL(38,0)", "DECIMAL(10,2)",
        "BIGINT[]", "DOUBLE[]", "STRUCT(a BIGINT)", "MAP(VARCHAR, BIGINT)",
        "BLOB", "HUGEINT", "UBIGINT", "TIME", "INTERVAL"]
    bad = [t for t in ok if unprecedented(t) is not None] + \
          [t for t in flag if unprecedented(t) is None]
    banned_bad = [t for t in ["HUGEINT", "UBIGINT", "TIME", "INTERVAL",
                              "STRUCT(a HUGEINT)"] if not is_banned(t)] + \
                 [t for t in ["TIMESTAMP", "TIMESTAMP WITH TIME ZONE",
                              "BIGINT"] if is_banned(t)]
    if bad or banned_bad:
        print(f"SELFTEST FAIL: precedent verdicts wrong for {bad}; "
              f"ban verdicts wrong for {banned_bad}")
        sys.exit(1)
    print(f"SELFTEST OK: {len(ok)} precedented, {len(flag)} flagged, "
          "ban list consistent")
    sys.exit(0)

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
        got_types = coltypes(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        exp_types = coltypes(sql)
    except Exception as e:
        print(f"FAIL {name}: exec error: {str(e)[:200]}")
        fails += 1
        continue
    if sorted(got_cols) != sorted(exp_cols):
        print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
        fails += 1
        continue
    banned = [(c, t) for c, t in exp_types if is_banned(t)]
    if banned:
        print(f"FAIL {name}: oracle column type has no Spark twin "
              f"(driver hash WILL diverge): {banned} — add an explicit CAST")
        fails += 1
        continue
    noprec = [(side, c, t)
              for side, ts in (("spark", got_types), ("oracle", exp_types))
              for c, t in ts if unprecedented(t)]
    if noprec:
        print(f"FAIL {name}: output type with no driver-GREEN hash "
              f"precedent (r14 calibration rule — do not ship): {noprec}")
        fails += 1
        continue
    classdiff = [(g, e) for g, e in zip(got_types, exp_types)
                 if (g[0], hclass(g[1])) != (e[0], hclass(e[1]))]
    if classdiff:
        print(f"FAIL {name}: column hash classes diverge (driver hash is "
              f"type-sensitive): spark-vs-oracle {classdiff}")
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
