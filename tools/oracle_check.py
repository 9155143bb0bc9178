#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (builder-side tooling only;
the Scala library has no Python dependency).

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify), runs
the matching oracle_sql.json entry in DuckDB over the sf_dir tables, sorts
columns by name + rows by all columns, and diffs values.

STRICTNESS (r13, after the r12 escape): this gate must be at least as strict
as the driver's, which (a) hash-compares pandas values dtype-sensitively —
DuckDB SUM(BIGINT)→HUGEINT materializes as float64 and hash-mismatches
Spark's int64 even when numerically equal (the r12 ann_pq red) — and
(b) sorts rows with pandas sort_values, which raises on array cells
(the r12 embedding_pq_codes red). So here:
  * any list/ndarray cell in EITHER side is an outright FAIL;
  * the two frames' dtypes must match exactly, column by column.
Both r12 defects red-flag under this gate; neither did under the old one.
"""
import json
import math
import sys

import duckdb
import pandas as pd


TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def array_cols(df: pd.DataFrame):
    bad = []
    for c in df.columns:
        if df[c].map(
            lambda v: (isinstance(v, (list, tuple)) or (hasattr(v, "tolist") and not isinstance(v, str))),
            na_action="ignore",
        ).any():
            bad.append(c)
    return bad


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first").reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
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
        bad_arrays = array_cols(got) + [c for c in array_cols(exp) if c not in array_cols(got)]
        if bad_arrays:
            failures.append(name)
            print(f"FAIL {name}: array-typed column(s) {bad_arrays} — the driver's pandas sort cannot hash these")
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            continue
        dtype_bad = [
            (c, str(g[c].dtype), str(e[c].dtype))
            for c in g.columns
            if str(g[c].dtype) != str(e[c].dtype)
        ]
        if dtype_bad:
            failures.append(name)
            print(f"FAIL {name}: dtype mismatch {dtype_bad} — the driver's hash is dtype-sensitive")
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
