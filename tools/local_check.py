#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs graft.Verify at the given SF, then executes each oracle SQL in DuckDB
over the same parquet tables and compares result sets (columns sorted by
name, rows sorted by all columns). Usage:

    python3 tools/local_check.py sf0.01 [--skip-verify] [query ...]
"""
import json
import math
import subprocess
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
ARGS = sys.argv[2:]
SKIP = "--skip-verify" in ARGS
ONLY = [a for a in ARGS if not a.startswith("--")]
SFDIR = f"/root/testdata/{SF}"
OUT = f"/tmp/verify_{SF}"

if not SKIP:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SFDIR} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write("\n".join(
        l for l in r.stdout.splitlines() if "[verify]" in l or "error" in l.lower()) + "\n")
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-2000:])
        sys.exit(1)

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
con = duckdb.connect()
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SFDIR}/{t}.parquet')")


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    return v


def fetch_sorted(rel):
    cols = sorted(rel.columns)
    df = rel.df()[cols]
    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if a == b:
            # Python's == treats -0.0 == 0.0 as true, but the driver's
            # hash compare does NOT: a DuckDB round() emitting -0.0
            # where Spark emits 0.0 is a real gate failure (round-13
            # q_heaps_law). Compare the sign bit on zero cells.
            if a == 0.0:
                return math.copysign(1.0, a) == math.copysign(1.0, b)
            return True
        return False
    return str(a) == str(b)


import os

errors = {}
if os.path.exists(f"{OUT}/errors.json"):
    errors = json.load(open(f"{OUT}/errors.json"))

ok_all = True
names = ONLY or sorted(oracle)
for name in names:
    # A query that threw in Verify must be a loud red row, never a
    # stale-parquet false pass (round-4 regression): Verify deletes the
    # output dir pre-run and writes a _FAILED marker + errors.json.
    if name in errors or os.path.exists(f"{OUT}/{name}/_FAILED"):
        print(f"[{name}] QUERY FAILED: {errors.get(name, '(see _FAILED marker)')}")
        ok_all = False
        continue
    if not os.path.isdir(f"{OUT}/{name}"):
        print(f"[{name}] MISSING OUTPUT DIR (query did not run?)")
        ok_all = False
        continue
    sql = oracle.get(name)
    if sql is None:
        print(f"[{name}] NO ORACLE (rows-only check)")
        continue
    try:
        got_cols, got = fetch_sorted(con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')"))
        exp_cols, exp = fetch_sorted(con.sql(sql))
    except Exception as e:
        print(f"[{name}] ERROR: {e}")
        ok_all = False
        continue
    if got_cols != exp_cols:
        print(f"[{name}] SCHEMA MISMATCH\n  ours:   {got_cols}\n  oracle: {exp_cols}")
        ok_all = False
        continue
    if len(got) != len(exp):
        print(f"[{name}] ROWCOUNT MISMATCH ours={len(got)} oracle={len(exp)}")
        for r in got[:3]:
            print("   ours:", r)
        for r in exp[:3]:
            print("   orcl:", r)
        ok_all = False
        continue
    bad = None
    for i, (g, e) in enumerate(zip(got, exp)):
        if not all(cells_equal(a, b) for a, b in zip(g, e)):
            bad = (i, g, e)
            break
    if bad:
        i, g, e = bad
        print(f"[{name}] VALUE MISMATCH at sorted-row {i} ({len(got)} rows)")
        print("   cols:", got_cols)
        print("   ours:", g)
        print("   orcl:", e)
        ok_all = False
    else:
        print(f"[{name}] OK ({len(got)} rows)")

sys.exit(0 if ok_all else 1)
