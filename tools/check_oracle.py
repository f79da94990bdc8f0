#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate. THE one oracle
tool — a previous near-duplicate (oracle_check.py) canonicalized floats
with %.6g (6 significant digits), which let large aggregates drift by
whole units and still "match"; it was removed rather than risk a local
green the driver's stricter compare would fail.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
       python3 tools/check_oracle.py --selftest

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers
each parquet table in <sfDir> as a DuckDB view, runs every oracle SQL, and
compares against the Spark result parquet in <verifyOutDir>/<name>/ as a
column-name-sorted multiset of rows (the driver sorts columns by name
before hashing). Floats compare after round(9) — absolute decimal places,
not significant figures. DuckDB DECIMAL columns (e.g. SUM over a DECIMAL)
arrive as object-dtype Decimal values; they are converted to float64
before rounding so they compare numerically against Spark's doubles.
Reports schema (dtype) mismatches separately since the driver may also
compare schemas.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    # Heavy sf1 oracles (shingle self-joins) can exhaust the default
    # resource envelope when many run on one connection; allow tuning
    # without changing default behavior.
    if os.environ.get("DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
    if os.environ.get("DUCKDB_MEMLIMIT"):
        con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEMLIMIT']}'")
    if os.environ.get("DUCKDB_TEMPDIR"):
        con.execute(f"SET temp_directory='{os.environ['DUCKDB_TEMPDIR']}'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    spark_dirs = {os.path.basename(d) for d in glob.glob(out_dir + "/*")
                  if os.path.isdir(d)}
    if only is not None:
        spark_dirs &= only
        oracles = {k: v for k, v in oracles.items() if k in only}
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
            # integer-vs-float is a HARD FAIL: the driver hashes raw values,
            # so int64 3840000 vs float64 3840000.0 hash-mismatch even though
            # a float coercion would compare equal. This is exactly the
            # DuckDB sum(BIGINT)→HUGEINT→float64 trap that sank stor3 in
            # round 11 (and cdc1 before it): the oracle SQL needs a final
            # CAST(... AS BIGINT). Decimal-vs-float stays a soft note (the
            # driver compares those numerically green).
            sk, ok_ = s[c].dtype.kind, o[c].dtype.kind
            if {sk, ok_} == {"f"} | {"i"} or {sk, ok_} == {"f"} | {"u"}:
                return False, (f"int/float dtype mismatch on '{c}': "
                               f"spark={s[c].dtype} oracle={o[c].dtype} — "
                               f"driver will hash-fail; CAST the oracle "
                               f"aggregate to BIGINT (HUGEINT trap)")
            notes.append(f"dtype {c}: spark={s[c].dtype} oracle={o[c].dtype}")
    if len(s) != len(o):
        return False, f"row count: spark={len(s)} oracle={len(o)}"
    # normalize to comparable reprs, sort rows, compare
    def norm(df):
        import decimal
        import numpy as np
        out = pd.DataFrame()
        for c in cols:
            col = df[c]
            # Decimal (or Decimal-and-float mix, e.g. NaN padding) →
            # float64. No notna() guard: astype maps None→NaN safely, and
            # an all-NULL object column must still convert so it compares
            # against Spark's float NaNs instead of as 'None' strings.
            if str(col.dtype) == "object" and col.map(
                    lambda v: v is None or
                    isinstance(v, (decimal.Decimal, float))).all():
                col = col.astype("float64")
            # list/array cells are unhashable and break sort_values;
            # normalize to tuples (rounded so float lists compare like
            # scalar float columns)
            elif str(col.dtype) == "object" and col.map(
                    lambda v: isinstance(v, (list, np.ndarray))).any():
                col = col.map(lambda v: tuple(
                    round(float(x), 9) if isinstance(x, (float, np.floating))
                    else x for x in v)
                    if isinstance(v, (list, np.ndarray)) else v)
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

def selftest():
    """The guarantees the old %.6g tool silently broke: a tiny absolute
    drift in a large aggregate must FAIL; numerically-equal Decimal vs
    float must PASS."""
    import pandas as pd
    import decimal
    base = pd.DataFrame({"g": ["a", "b"], "s": [38000000.0, 1.25]})
    # 1e-5 drift on a ~3.8e7 aggregate: identical to 6 significant
    # figures, different at round(9)
    drift = pd.DataFrame({"g": ["a", "b"], "s": [38000000.00001, 1.25]})
    ok, _ = compare(base, drift)
    assert not ok, "1e-5 drift on a large aggregate must FAIL"
    dec = pd.DataFrame({"g": ["a", "b"], "s": [
        decimal.Decimal("38000000.0"), decimal.Decimal("1.25")]})
    ok, _ = compare(base, dec)
    assert ok, "Decimal column numerically equal to float must PASS"
    decnull = pd.DataFrame({"g": ["a", "b"], "s": [
        decimal.Decimal("38000000.0"), None]})
    ok, _ = compare(
        pd.DataFrame({"g": ["a", "b"], "s": [38000000.0, float("nan")]}),
        decnull)
    assert ok, "Decimal with NULLs must still compare numerically"
    ok, _ = compare(base, base.copy())
    assert ok, "identical frames must PASS"
    # all-NULL object column vs float NaN column must compare numerically
    ok, _ = compare(
        pd.DataFrame({"g": ["a", "b"], "s": [float("nan"), float("nan")]}),
        pd.DataFrame({"g": ["a", "b"], "s": [None, None]}))
    assert ok, "all-NULL Decimal/object column must PASS against NaNs"
    # list cells must not crash the row sort and must compare by value
    import numpy as np
    ok, _ = compare(
        pd.DataFrame({"g": ["a", "b"],
                      "v": [np.array([1.0, 2.0]), np.array([3.0])]}),
        pd.DataFrame({"g": ["a", "b"], "v": [[1.0, 2.0], [3.0]]}))
    assert ok, "array cells must compare by value"
    ok, _ = compare(
        pd.DataFrame({"g": ["a"], "v": [np.array([1.0, 2.0])]}),
        pd.DataFrame({"g": ["a"], "v": [[1.0, 2.5]]}))
    assert not ok, "differing array cells must FAIL"
    # the round-11 stor3 trap: spark int64 vs oracle float64 (HUGEINT via
    # pandas) with numerically-equal values must FAIL — the driver hashes
    # raw values and 3840000 != 3840000.0
    ok, msg = compare(
        pd.DataFrame({"g": ["a"], "s": np.array([3840000], dtype="int64")}),
        pd.DataFrame({"g": ["a"], "s": [3840000.0]}))
    assert not ok and "int/float" in msg, \
        "int64-vs-float64 dtype mismatch must HARD FAIL (HUGEINT trap)"
    print("selftest: 8/8 ok")

if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
        sys.exit(0)
    only = None
    argv = [a for a in sys.argv[1:] if not a.startswith("--only=")]
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a[len("--only="):].split(","))
    sys.exit(main(argv[0], argv[1], only))
