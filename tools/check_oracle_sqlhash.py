#!/usr/bin/env python3
"""In-engine variant of check_oracle.py for LARGE result sets: instead of
materializing both sides into Python (which needs ~6 GB per 1M rows), the
row-set comparison happens inside DuckDB — each side is reduced to
(row_count, sum-of-md5-prefixes over the canonically-stringified row), an
order-independent multiset fingerprint. Columns are compared by sorted name;
values stringify via DuckDB casts, so float formatting differences between
engines would show up here (use the exact-integer/string queries with this
tool — which is what the big pair/path queries are).
Usage: ORACLE_ONLY=a,b python3 tools/check_oracle_sqlhash.py <sf_dir> <out_dir>
"""
import sys, json, glob, os, os.path, time
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
skip = set(filter(None, os.environ.get("ORACLE_SKIP", "").split(",")))
only = set(filter(None, os.environ.get("ORACLE_ONLY", "").split(",")))
oracle = {k: v for k, v in oracle.items()
          if k not in skip and (not only or k in only)}

def fingerprint(rel_sql, cols):
    # Per-column canonicalization that is injective on rows: NULL maps to a
    # sentinel no cast can produce (chr(0) prefix), every value is md5-hashed
    # BEFORE concatenation (fixed width, so no separator-injection or
    # NULL-shift can make distinct rows stringify identically).
    ordered = sorted(cols)
    canon = ", ".join(
        f"coalesce(md5(CAST(\"{c}\" AS VARCHAR)), chr(0) || 'NULL')"
        for c in ordered)
    q = (f"SELECT count(*)::BIGINT AS n, "
         f"coalesce(sum(('0x' || substr(md5(concat_ws('|', {canon})), 1, 14))::BIGINT), 0) AS h "
         f"FROM ({rel_sql})")
    n, h = con.sql(q).fetchall()[0]
    return n, h, [c.lower() for c in ordered]

fails = 0
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        ocols = [c for c in con.sql(f"SELECT * FROM ({sql}) LIMIT 0").columns]
        on, oh, ocl = fingerprint(sql, ocols)
        spark_sql = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        scols = [c for c in con.sql(f"{spark_sql} LIMIT 0").columns]
        sn, sh, scl = fingerprint(spark_sql, scols)
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    if ocl != scl:
        print(f"FAIL {name}: columns differ oracle={ocl} spark={scl}")
        fails += 1
    elif (on, oh) != (sn, sh):
        print(f"FAIL {name}: rows/hash differ oracle=({on},{oh}) spark=({sn},{sh})")
        fails += 1
    else:
        print(f"OK   {name}: {on} rows fingerprint-match ({time.time()-t0:.1f}s)")
print(f"\n{len(oracle)-fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
