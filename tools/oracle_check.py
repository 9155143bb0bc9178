#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (builder-side tooling only;
the Scala library has no Python dependency).

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify), runs
the matching oracle_sql.json entry in DuckDB over the sf_dir tables, sorts
columns by name + rows by all columns, and diffs values.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # lists/arrays -> tuples so they sort/compare
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, str), na_action="ignore").any():
            df[c] = df[c].map(lambda v: tuple(v.tolist()) if hasattr(v, "tolist") else (tuple(v) if isinstance(v, (list, tuple)) else v))
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first").reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    if pd.isna(a) is True and pd.isna(b) is True:
        return True
    return a == b


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')").df()
            exp = con.sql(sql).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: exception {str(e)[:200]}")
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            continue
        if len(g) != len(e):
            failures.append(name)
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            continue
        bad = None
        for col in g.columns:
            for i, (x, y) in enumerate(zip(g[col], e[col])):
                if not values_equal(x, y):
                    bad = (col, i, x, y)
                    break
            if bad:
                break
        if bad:
            failures.append(name)
            print(f"FAIL {name}: col={bad[0]} row={bad[1]} got={bad[2]!r} exp={bad[3]!r}")
        else:
            print(f"OK   {name}: {len(g)} rows x {len(g.columns)} cols")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} oracle-checked queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
