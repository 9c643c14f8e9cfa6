#!/usr/bin/env python3
"""Local self-check that mimics the driver's DuckDB oracle compare.

NOT part of the shipped library (driver-side tooling only). Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Compares each <verifyOutDir>/<name> parquet dump against the DuckDB result
of oracle_sql.json[<name>] run over <sfDir>'s parquet tables: sorts columns
by name, sorts rows, exact value compare.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        try:
            got = canon(
                duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: spark dump unreadable: {e}")
            n_bad += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != oracle {list(exp.columns)}")
            n_bad += 1
            continue
        if exp.shape != got.shape:
            print(f"FAIL {name}: shape {got.shape} != oracle {exp.shape}")
            n_bad += 1
            continue
        # exact value compare, column by column
        bad_cols = []
        for c in exp.columns:
            e_vals, g_vals = exp[c], got[c]
            try:
                eq = (e_vals.isna() & g_vals.isna()) | (e_vals == g_vals)
            except Exception:
                eq = e_vals.astype(str) == g_vals.astype(str)
            if not bool(eq.all()):
                idx = (~eq).idxmax()
                bad_cols.append(
                    f"{c} (row {idx}: got={g_vals[idx]!r} exp={e_vals[idx]!r})")
        if bad_cols:
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(exp)} rows)")
    print(f"\n{len(oracle) - n_bad}/{len(oracle)} queries match")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
