#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers
each parquet table in <sfDir> as a DuckDB view, runs every oracle SQL, and
compares against the Spark result parquet in <verifyOutDir>/<name>/ as a
column-name-sorted multiset of rows (the driver sorts columns by name
before hashing). Reports schema (dtype) mismatches separately since the
driver may also compare schemas.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    spark_dirs = {os.path.basename(d) for d in glob.glob(out_dir + "/*")
                  if os.path.isdir(d)}
    for name in sorted(spark_dirs):
        if name not in oracles:
            print(f"[rows-only] {name}: no oracle; spark rows =",
                  con.execute(
                      f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'"
                  ).fetchone()[0])
            continue
        try:
            oracle = con.execute(oracles[name]).fetchdf()
            spark = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: exec error: {e}")
            n_fail += 1
            continue
        ok, msg = compare(spark, oracle)
        if ok:
            n_pass += 1
            print(f"[ok]   {name}: {len(spark)} rows" +
                  (f"  ({msg})" if msg else ""))
        else:
            n_fail += 1
            print(f"[FAIL] {name}: {msg}")
    missing = set(oracles) - spark_dirs
    for name in sorted(missing):
        print(f"[FAIL] {name}: oracle present but no spark output")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

def compare(spark, oracle):
    import pandas as pd
    notes = []
    if sorted(spark.columns) != sorted(oracle.columns):
        return False, (f"column mismatch: spark={sorted(spark.columns)} "
                       f"oracle={sorted(oracle.columns)}")
    cols = sorted(spark.columns)
    s = spark[cols].copy()
    o = oracle[cols].copy()
    for c in cols:
        if str(s[c].dtype) != str(o[c].dtype):
            notes.append(f"dtype {c}: spark={s[c].dtype} oracle={o[c].dtype}")
    if len(s) != len(o):
        return False, f"row count: spark={len(s)} oracle={len(o)}"
    # normalize to comparable reprs, sort rows, compare
    def norm(df):
        out = pd.DataFrame()
        for c in cols:
            col = df[c]
            if str(col.dtype).startswith("float"):
                out[c] = col.round(9)
            elif "datetime" in str(col.dtype):
                out[c] = col.astype("datetime64[us]")
            else:
                out[c] = col
        return out.sort_values(cols).reset_index(drop=True)
    s, o = norm(s), norm(o)
    eq = s.compare(o)
    if len(eq) > 0:
        first = eq.head(3)
        return False, f"{len(eq)} differing rows; first:\n{first}"
    return True, "; ".join(notes)

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
