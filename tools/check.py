#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads <out>/oracle_sql.json, runs each SQL in DuckDB over the sf parquet
tables, loads the Spark-side parquet dump, normalizes (sort columns by
name, sort rows, stringify) and diffs. NOT part of the shipped library —
dev harness only (driver-side python deps).
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    s = df.astype(str)
    s = s.sort_values(by=list(s.columns), kind="mergesort").reset_index(drop=True)
    return s


def main(outdir: str, sfdir: str) -> int:
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    failed = []
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failed.append(name)
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failed.append(name)
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
            failed.append(name)
        elif len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            failed.append(name)
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            print(f"FAIL {name}: {neq.sum()} differing rows; first:")
            print(pd.concat([a[neq].head(3).add_suffix("_spark"),
                             b[neq].head(3).add_suffix("_duck")], axis=1).to_string())
            failed.append(name)
        else:
            print(f"OK   {name} ({len(a)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
