#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB at a given scale dir (the judge's
comparison baseline): min of two runs per query, 32 threads.

Usage: python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json> [detail.json]
  (get oracle_sql.json from a graft.Verify run's outDir)

Prints one line per query plus a total — this is the denominator for
"Spark vs DuckDB" per-query ratios; it is NOT the correctness gate
(that's check_oracle.py).

When a BENCH_DETAIL.json path is given as the third argument, the
per-query DuckDB seconds are merged into it under "duckdb" (plus a
"ratio_top" of the 15 worst spark/duckdb ratios), so the suite-level
paired ratio can be decomposed into the individual queries that are
slower than the columnar baseline (VERDICT r14 #7).
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

    if len(sys.argv) > 3:
        merge_into_detail(sys.argv[3], dict(rows))


def merge_into_detail(detail_path: str, duck: dict) -> None:
    """Attach per-query duckdb seconds (and the worst spark/duckdb
    ratios) to an existing BENCH_DETAIL.json. Spark keys there are
    short (family prefix) unless ambiguous — mirror Bench.shortKey.
    """
    detail = json.load(open(detail_path))
    spark_q = detail.get("queries", {})

    def short(name: str) -> str:
        return name.split("_")[0]

    shorts = {}
    for name in duck:
        shorts.setdefault(short(name), []).append(name)

    def key(name: str) -> str:
        return name if len(shorts[short(name)]) > 1 else short(name)

    duck_k = {key(n): round(s, 3) for n, s in duck.items()}
    detail["duckdb"] = {k: duck_k[k] for k in sorted(duck_k)}
    ratios = sorted(
        ((k, round(spark_q[k] / duck_k[k], 2))
         for k in duck_k if k in spark_q and duck_k[k] > 0),
        key=lambda r: -r[1])
    detail["ratio_top"] = dict(ratios[:15])
    with open(detail_path, "w") as f:
        json.dump(detail, f, separators=(",", ":"))
        f.write("\n")
    # ALSO write the merged artifact to its own file (ADVICE/VERDICT
    # r15 #7): a fresh graft.Bench run rewrites BENCH_DETAIL.json and
    # would silently drop the duckdb/ratio_top columns — BENCH_PAIRED
    # .json is owned by THIS script only, so the paired-run evidence
    # survives any number of later Spark-only bench passes.
    import os
    paired_path = os.path.join(os.path.dirname(os.path.abspath(
        detail_path)), "BENCH_PAIRED.json")
    with open(paired_path, "w") as f:
        json.dump(detail, f, separators=(",", ":"))
        f.write("\n")
    print(f"merged duckdb column into {detail_path} + {paired_path} "
          f"({len(duck_k)} queries, worst ratio "
          f"{ratios[0][0]}={ratios[0][1]}x)" if ratios else "")


if __name__ == "__main__":
    main()
