#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare rows/schema/value-hash against
the Verify parquet dumps. Dev tool only (driver-side python env)."""
import duckdb, json, sys, glob, os, hashlib

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r5"

con = duckdb.connect()
for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

import datetime

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, datetime.datetime):
        return str(v.date()) if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0) else str(v)
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

fails = []
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    spark_rel = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')")
    scols, srows = [c.lower() for c in spark_rel.columns], spark_rel.fetchall()
    if name not in oracle:
        print(f"{name:28s} rows={len(srows):6d}  (no oracle — rows-only)")
        continue
    try:
        orel = con.sql(oracle[name])
        ocols, orows = [c.lower() for c in orel.columns], orel.fetchall()
    except Exception as e:
        print(f"{name:28s} ORACLE ERROR: {e}")
        fails.append(name)
        continue
    rows_ok = len(srows) == len(orows)
    schema_ok = sorted(scols) == sorted(ocols)
    hash_ok = schema_ok and table_hash(scols, srows) == table_hash(ocols, orows)
    status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
    if status == "FAIL":
        fails.append(name)
    print(f"{name:28s} rows={len(srows):6d}/{len(orows):6d} "
          f"schema={'Y' if schema_ok else 'N'} hash={'Y' if hash_ok else 'N'} {status}")
print(f"\n{len(fails)} failures: {fails}" if fails else "\nALL GREEN")
sys.exit(1 if fails else 0)
