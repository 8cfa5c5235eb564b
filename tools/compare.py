#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle (oracle_sql.json) over the same fixture
tables and compare exactly (columns sorted by name, values hashed).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    import datetime
    for c in df.columns:
        # tz-naive everywhere (spark writes NTZ; duckdb returns naive)
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_localize(None)
        # pandas renders DuckDB DATE as datetime64 but parquet DATE as
        # datetime.date objects — coerce both to Timestamp for compare
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
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    def isna(v):
        try:
            return bool(pd.isna(v))
        except (TypeError, ValueError):
            return False  # arrays etc. are never NA as a whole
    if isna(a) and isna(b):
        return True
    if isna(a) != isna(b):
        return False
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (a != a and b != b)
    if isinstance(a, (bool,)) or isinstance(b, (bool,)):
        return bool(a) == bool(b)
    # numeric cross-type (Decimal vs int etc.)
    import decimal
    num = (int, float, decimal.Decimal)
    if isinstance(a, num) and isinstance(b, num):
        try:
            return decimal.Decimal(str(a)) == decimal.Decimal(str(b))
        except decimal.InvalidOperation:
            return str(a) == str(b)
    if hasattr(a, "__len__") and not isinstance(a, str):
        if not hasattr(b, "__len__") or len(a) != len(b):
            return False
        return all(cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failed = []
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failed.append(name)
            continue
        try:
            duck_df = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
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
                if not cells_equal(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: cell [{i}].{c}: spark={x!r} duck={y!r}")
            failed.append(name)
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")

    print(f"\n{len(oracles) - len(failed)}/{len(oracles)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
