#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle
SQL from verify-output oracle_sql.json in DuckDB over the sfDir
parquet tables, compare against the Spark result parquet.

Strict by default, matching the driver's gate:
  - any oracle column whose DuckDB result type is HUGEINT / UHUGEINT /
    DECIMAL is an ORACLE-TYPE failure (the driver hashes the raw value
    encoding, so an int128 sum never matches a Spark BIGINT even when
    the values are equal — CAST the oracle column instead);
  - numeric kind must agree (int vs float is a TYPE failure, not a
    coercion);
  - floats compare with rtol=1e-9 (atol=1e-12). Empirical bracket of
    the driver's gate from 5 rounds of CORRECTNESS_r*.json: 1-ulp
    summation-order diffs (rel ~1e-15) always pass — including rows
    straddling every fixed decimal grid from 7 to 8 significant digits
    and an exact float32 tie — while q_price_fill's half-cent flips
    (rel 2.2e-7) failed. So the driver is tolerance-like with a
    threshold somewhere in (1e-15, 2e-7); rtol=1e-9 is two orders
    stricter than anything it has been seen to accept. Pass --loose
    for the old np.isclose(rtol=1e-6) triage behaviour, or --exact
    for ZERO tolerance (bit-equality, nan==nan) — the audit mode of
    docs/ORACLE_NOTES.md: queries that fail --exact but pass strict
    are exactly the documented 1-ulp summation-order class, and any
    NEW entrant to that list needs an ORACLE_NOTES exactness argument.

Usage: python3 tools/check.py SF_DIR OUT_DIR [--loose|--exact]
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BAD_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def kind(dtype) -> str:
    if np.issubdtype(dtype, np.bool_):
        return "bool"
    if np.issubdtype(dtype, np.integer):
        return "int"
    if np.issubdtype(dtype, np.floating):
        return "float"
    if str(dtype).startswith("datetime64"):
        return "datetime"
    return "object"


def compare(name, spark_df, oracle_df, loose=False, exact=False):
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS {len(a)} vs {len(b)}"
    for c in a.columns:
        x, y = a[c], b[c]
        kx, ky = kind(x.dtype), kind(y.dtype)
        if kx != ky:
            # --loose restores the old triage behaviour: numeric-kind
            # mismatches (e.g. HUGEINT rendered as float64) coerce and
            # compare by value instead of hard-failing on the dtype
            if loose and {kx, ky} == {"int", "float"}:
                x, y = x.astype(float), y.astype(float)
                kx = ky = "float"
            else:
                return (f"TYPE col {c}: spark {x.dtype} ({kx})"
                        f" vs oracle {y.dtype} ({ky})")
        if kx == "float":
            xv, yv = x.to_numpy(), y.to_numpy()
            if exact:
                ok = (xv == yv) | (np.isnan(xv) & np.isnan(yv))
            elif loose:
                ok = np.isclose(xv, yv, rtol=1e-6, atol=1e-9, equal_nan=True)
            else:
                ok = np.isclose(xv, yv, rtol=1e-9, atol=1e-12,
                                equal_nan=True)
            if not ok.all():
                i = int(np.argmin(ok))
                n_bad = int((~ok).sum())
                return (f"VALUE col {c} row {i}: {xv[i]!r} vs {yv[i]!r}"
                        f" ({n_bad}/{len(ok)} rows differ)")
        else:
            if not x.equals(y):
                neq = (x != y)
                i = int(neq.idxmax())
                return f"VALUE col {c} row {i}: {x[i]!r} vs {y[i]!r}"
    return None


def main(sf_dir, out_dir, loose=False, exact=False):
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
            rel = con.sql(sql)
            bad = [(col, str(t)) for col, t in zip(rel.columns, rel.types)
                   if any(str(t).upper().startswith(p) for p in BAD_ORACLE_TYPES)]
            oracle_df = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            continue
        if bad and not loose:
            print(f"FAIL {name}: ORACLE-TYPE {bad} (CAST the oracle column)")
            continue
        err = compare(name, spark_df, oracle_df, loose=loose, exact=exact)
        if err:
            print(f"FAIL {name}: {err}")
        else:
            n_ok += 1
            print(f"ok   {name} ({len(spark_df)} rows)")
    print(f"== {n_ok}/{len(oracles)} matched")
    return n_ok == len(oracles)


if __name__ == "__main__":
    loose = "--loose" in sys.argv
    exact = "--exact" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sys.exit(0 if main(args[0], args[1], loose=loose, exact=exact) else 1)
