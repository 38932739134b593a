#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run each oracle
SQL from oracle_sql.json in DuckDB over the same sf tables, compare to
the Spark result parquet — columns sorted by name, rows sorted, values
hashed. Dev tool only (driver-side python is allowed for checking)."""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # stringify for stable compare (floats via repr to catch drift)
    df = df.copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name in sorted(glob.glob(f"{out_dir}/q*")):
        qname = name.split("/")[-1]
        spark_df = con.sql(f"SELECT * FROM read_parquet('{name}/*.parquet')").df()
        if qname not in oracle:
            print(f"{qname:24s} NO-ORACLE rows={len(spark_df)}")
            continue
        try:
            duck_df = con.sql(oracle[qname]).df()
        except Exception as e:
            print(f"{qname:24s} ORACLE-SQL-ERROR {str(e).splitlines()[0][:120]}")
            fails += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"{qname:24s} SCHEMA-MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
            fails += 1
        elif len(a) != len(b):
            print(f"{qname:24s} ROWCOUNT spark={len(a)} duck={len(b)}")
            fails += 1
        elif not a.equals(b):
            diff = (a != b).any(axis=1)
            i = diff.idxmax()
            print(f"{qname:24s} VALUE-MISMATCH {int(diff.sum())}/{len(a)} rows; first@{i}:")
            print("  spark:", a.iloc[i].to_dict())
            print("  duck :", b.iloc[i].to_dict())
            fails += 1
        else:
            print(f"{qname:24s} OK rows={len(a)}")
    # dtype report (schema strictness unknown; keep an eye on it)
    return fails

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
