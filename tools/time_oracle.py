#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB over the sf parquet tables (no compare):
the single-node reference side of the per-query perf sweep. Pairs with
`graft.tools.SweepTime` (the Spark side). Usage:
  python3 tools/time_oracle.py <sf_dir> <oracle_sql.json> [only,names]
Env: ORACLE_SKIP / ORACLE_ONLY comma lists (same contract as check_oracle.py).
Prints one `otime <name> rows=<n> sec=<s>` line per query and a final JSON map.
"""
import sys, json, glob, os, os.path, time
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
sql_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout/oracle_sql.json"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(sql_path))
skip = set(filter(None, os.environ.get("ORACLE_SKIP", "").split(",")))
only = set(filter(None, os.environ.get("ORACLE_ONLY", "").split(",")))
if len(sys.argv) > 3:
    only |= set(filter(None, sys.argv[3].split(",")))
oracle = {k: v for k, v in oracle.items()
          if k not in skip and (not only or k in only)}

out = {}
for name, sql in sorted(oracle.items()):
    try:
        t0 = time.time()
        rows = con.sql(sql).fetchall()
        dt = time.time() - t0
        out[name] = round(dt, 4)
        print(f"otime {name} rows={len(rows)} sec={dt:.3f}", flush=True)
    except Exception as e:
        out[name] = -1.0
        print(f"otime {name} FAILED: {e}", flush=True)
print("OTIME_JSON " + json.dumps(out))
