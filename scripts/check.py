#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs graft.Verify (Spark) into a temp dir, then executes every oracle SQL in
DuckDB over the same parquet tables and compares results: row count, column
names, and order-insensitive value hash. Usage:

    python3 scripts/check.py [sf_dir] [--only q01_pricing_summary,...]
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
OUT = Path("/root/repo/target/verify_out")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

only = None
for a in sys.argv[1:]:
    if a.startswith("--only"):
        if "=" not in a:
            sys.exit("usage: --only=q01_name,q02_name (single '='-joined argument)")
        only = set(a.split("=", 1)[1].split(","))


def run_verify():
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-25:])
    if r.returncode != 0:
        print(tail)
        sys.exit(f"Verify failed rc={r.returncode}")
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def frame_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    import hashlib
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    run_verify()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    results = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        mine_dir = OUT / name
        if not mine_dir.exists():
            results[name] = "MISSING spark output"
            continue
        mine = con.sql(f"SELECT * FROM '{mine_dir}/*.parquet'")
        m_cols, m_rows = mine.columns, mine.fetchall()
        try:
            ref = con.sql(sql)
            r_cols, r_rows = ref.columns, ref.fetchall()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            continue
        if sorted(m_cols) != sorted(r_cols):
            results[name] = f"COLS mine={sorted(m_cols)} ref={sorted(r_cols)}"
        elif len(m_rows) != len(r_rows):
            results[name] = f"ROWS mine={len(m_rows)} ref={len(r_rows)}"
        elif frame_key(m_rows, m_cols) != frame_key(r_rows, r_cols):
            # find first differing line for debugging
            order = sorted(range(len(m_cols)), key=lambda i: m_cols[i])
            a = sorted("|".join(norm_cell(r[i]) for i in order) for r in m_rows)
            b = sorted("|".join(norm_cell(r[i]) for i in order) for r in r_rows)
            diff = next((f"mine={x} ref={y}" for x, y in zip(a, b) if x != y), "?")
            results[name] = f"HASH mismatch ({len(m_rows)} rows) first-diff: {diff[:300]}"
        else:
            results[name] = f"OK ({len(m_rows)} rows)"
    npass = sum(1 for v in results.values() if v.startswith("OK"))
    for name, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith('OK') else 'FAIL'} {name}: {v}")
    print(f"\n{npass}/{len(results)} queries match")
    if not results:
        sys.exit("no queries matched the --only filter — nothing was verified")
    sys.exit(0 if npass == len(results) else 1)


if __name__ == "__main__":
    main()
