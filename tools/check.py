#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle
SQL from verify-output oracle_sql.json in DuckDB over the sfDir
parquet tables, compare against the Spark result parquet (sorted
columns, sorted rows, float tolerance). Dev tool only — not shipped.

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_sf0.01
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name, spark_df, oracle_df):
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS {len(a)} vs {len(b)}"
    for c in a.columns:
        x, y = a[c], b[c]
        if np.issubdtype(x.dtype, np.floating) or np.issubdtype(y.dtype, np.floating):
            xv = x.astype(float).to_numpy()
            yv = y.astype(float).to_numpy()
            ok = np.isclose(xv, yv, rtol=1e-6, atol=1e-9, equal_nan=True)
            if not ok.all():
                i = int(np.argmin(ok))
                return f"VALUE col {c} row {i}: {xv[i]} vs {yv[i]}"
        else:
            if not x.equals(y):
                neq = (x != y)
                i = int(neq.idxmax())
                return f"VALUE col {c} row {i}: {x[i]!r} vs {y[i]!r}"
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            continue
        try:
            oracle_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            continue
        err = compare(name, spark_df, oracle_df)
        if err:
            print(f"FAIL {name}: {err}")
        else:
            n_ok += 1
            print(f"ok   {name} ({len(spark_df)} rows)")
    print(f"== {n_ok}/{len(oracles)} matched")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
