#!/usr/bin/env python3
"""Strict driver-mimicking correctness gate: sort columns by name, sort rows
by all columns, then require exact (type+repr) cell equality — the way a
hash-of-values compare behaves. Reports the first differing cell per query
with both types so representation diffs (Decimal scale, float bits,
int32/int64, date/datetime) are visible.

Usage: python3 tools/strict_compare.py <sfDir> <verifyOutDir> [name ...]
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def sort_rows(df: pd.DataFrame) -> pd.DataFrame:
    # the driver sorts by all columns; array cells (which pandas cannot
    # order) sort by their repr — the queries ending in a total ORDER BY
    # make the sort a stable no-op anyway, this only keeps the tool
    # usable on array-typed results (the driver compares those green)
    if len(df.columns) == 0 or len(df) == 0:
        return df.reset_index(drop=True)
    import numpy as np
    keys = pd.DataFrame({
        c: (df[c].map(lambda v: repr(list(v)) if isinstance(v, np.ndarray) else v)
            if df[c].dtype == object else df[c])
        for c in df.columns})
    order = keys.sort_values(by=list(df.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize date representation the way the driver's canonicalizer
    # does (CORRECTNESS_r02: DATE columns hash-match even though pandas
    # yields datetime.date objects from parquet and Timestamps from
    # duckdb fetchdf)
    import datetime
    for c in df.columns:
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_localize(None)
        elif df[c].dtype == object:
            def _dateish(v):
                if isinstance(v, datetime.date):
                    return True
                try:
                    return bool(pd.isna(v))
                except (TypeError, ValueError):
                    return False
            if df[c].map(_dateish).all() and df[c].notna().any():
                df[c] = pd.to_datetime(df[c])
    return sort_rows(df)


def cell_repr(v):
    if v is None:
        return "None"
    if isinstance(v, float) and v != v:
        return "NaN"
    try:
        if pd.isna(v):
            return "NA"
    except (TypeError, ValueError):
        pass
    if isinstance(v, np.ndarray):
        return "[" + ",".join(cell_repr(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(cell_repr(x) for x in v) + "]"
    if isinstance(v, np.floating):
        return repr(float(v))
    if isinstance(v, np.integer):
        return repr(int(v))
    if isinstance(v, np.bool_):
        return repr(bool(v))
    return repr(v)


def main(argv):
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    # a typo'd CLI name must not silently inflate the pass count
    unknown = only - set(oracles)
    if unknown:
        print(f"ERROR: unknown query name(s): {', '.join(sorted(unknown))}")
        return 2

    failed = []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_df = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark side: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        try:
            duck_df = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle side: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            failed.append(name)
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            failed.append(name)
            continue
        bad = None
        for c in spark_df.columns:
            sv, dv = spark_df[c].tolist(), duck_df[c].tolist()
            for i, (x, y) in enumerate(zip(sv, dv)):
                if cell_repr(x) != cell_repr(y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: [{i}].{c}: spark={cell_repr(x)} ({type(x).__name__})"
                  f" duck={cell_repr(y)} ({type(y).__name__})")
            failed.append(name)
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")

    total = len(only) if only else len(oracles)
    print(f"\n{total - len(failed)}/{total} strict-passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
