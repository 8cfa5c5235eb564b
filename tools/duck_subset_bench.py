#!/usr/bin/env python3
"""DuckDB min-of-3-warm timings for a subset of the oracle corpus at a
given fixture dir — the baseline side of the BENCH_NOTES scale-curve
table (sf0.1 / sf1 / sf3 tiers).

Usage: python3 tools/duck_subset_bench.py <sfDir> <oracle_sql.json> <name> [name ...]
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_path, names):
    con = duckdb.connect()
    con.execute(f"SET threads TO 32")
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # Spark writes a directory of part files; the driver fixture is a file
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(oracle_path))
    total = 0.0
    out = {}
    for name in names:
        sql = oracle.get(name)
        if sql is None:
            print(f"{name:36s} (no oracle)")
            continue
        best = None
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = best
        total += best
        print(f"{name:36s} {best:8.3f}")
    print(f"TOTAL {total:.3f} over {len(out)} queries")
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
