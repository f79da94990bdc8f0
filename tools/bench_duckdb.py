#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB at a given scale dir (the judge's
comparison baseline): min of two runs per query, 32 threads.

Usage: python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json>
  (get oracle_sql.json from a graft.Verify run's outDir)

Prints one line per query plus a total — this is the denominator for
"Spark vs DuckDB" per-query ratios; it is NOT the correctness gate
(that's check_oracle.py).
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(oracle_path))
    total = 0.0
    rows = []
    for name in sorted(oracles):
        sql = oracles[name]
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            con.execute(sql).fetchall()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        rows.append((name, best))
        total += best
    for name, sec in sorted(rows, key=lambda r: -r[1]):
        print(f"{sec:8.3f}s  {name}")
    print(f"{total:8.3f}s  TOTAL ({len(rows)} queries)")


if __name__ == "__main__":
    main()
