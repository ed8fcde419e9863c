#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare (sorted rows, sorted columns)
against the Spark parquet dumps produced by `graft.Verify`."""
import sys, json, glob, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

con = duckdb.connect()
import os.path
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    src = f"{p}/*.parquet" if os.path.isdir(p) else p  # Spark writes dirs
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return repr(v)
    return repr(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

import os, time
skip = set(filter(None, os.environ.get("ORACLE_SKIP", "").split(",")))
only = set(filter(None, os.environ.get("ORACLE_ONLY", "").split(",")))
oracle = {k: v for k, v in oracle.items()
          if k not in skip and (not only or k in only)}

fails = 0
for name, sql in sorted(oracle.items()):
    t_start = time.time()
    try:
        o = con.sql(sql)
        ocols, orows = canon([c for c in o.columns], o.fetchall())
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fails += 1
        continue
    try:
        s = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        scols, srows = canon([c for c in s.columns], s.fetchall())
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}")
        fails += 1
        continue
    if [c.lower() for c in ocols] != [c.lower() for c in scols]:
        print(f"FAIL {name}: columns differ: oracle={ocols} spark={scols}")
        fails += 1
        continue
    if len(orows) != len(srows):
        print(f"FAIL {name}: row count oracle={len(orows)} spark={len(srows)}")
        fails += 1
        continue
    bad = [(a, b) for a, b in zip(orows, srows) if a != b]
    if bad:
        print(f"FAIL {name}: {len(bad)}/{len(orows)} rows differ; first: oracle={bad[0][0]} spark={bad[0][1]}")
        fails += 1
    else:
        print(f"OK   {name}: {len(orows)} rows ({time.time() - t_start:.1f}s)", flush=True)
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
