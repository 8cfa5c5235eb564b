#!/usr/bin/env python3
"""Per-query Spark-vs-DuckDB ratio table: times each oracle SQL in
DuckDB (min of 3 reps, warm) at the given scale and joins it with a
Bench JSON line. Queries without an oracle are skipped.

Usage: python3 tools/bench_ratio.py <sfDir> <oracle_sql.json> <bench.json>
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_path, bench_path):
    con = duckdb.connect()
    for t in TABLES:
        import os
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written parquet is a directory
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    with open(oracle_path) as f:
        oracles = json.load(f)
    with open(bench_path) as f:
        bench = json.load(f)["queries"]

    rows = []
    duck_total = 0.0
    spark_total = 0.0
    for name, spark_s in sorted(bench.items()):
        sql = oracles.get(name)
        if sql is None:
            continue
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        duck_total += best
        spark_total += spark_s
        rows.append((name, spark_s, best, spark_s / best if best > 0 else float("inf")))

    rows.sort(key=lambda r: -r[3])
    print(f"{'query':32s} {'spark_s':>8s} {'duck_s':>8s} {'ratio':>7s}")
    for name, s, d, r in rows:
        print(f"{name:32s} {s:8.3f} {d:8.3f} {r:7.1f}")
    print(f"\ntotals: spark={spark_total:.1f}s duck={duck_total:.1f}s "
          f"ratio={spark_total / duck_total:.1f}x over {len(rows)} oracled queries")
    over2 = [r for r in rows if r[1] - 0.35 > 2 * r[2]]
    print(f"queries with data-path (spark-0.35s floor) > 2x duckdb: {len(over2)}")
    for name, s, d, r in over2:
        print(f"  {name}: {s:.2f}s vs {d:.2f}s")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
