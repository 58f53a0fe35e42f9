#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [queryName...]

Loads each Spark result parquet from <verifyOutDir>/<name>/, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the raw tables,
sorts columns by name and rows by all columns, and compares values.
Dev-only tool (driver-side python); the shipped Scala library does not
depend on it.
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            spark_df = norm(pd.concat([pd.read_parquet(f) for f in files]))
            duck_df = norm(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_bad += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_bad += 1; continue
        try:
            # exact value compare, mirroring a hash match
            mismatch = []
            for c in spark_df.columns:
                a, b = spark_df[c], duck_df[c]
                try:
                    eq = (a.astype(object).where(a.notna(), None) ==
                          b.astype(object).where(b.notna(), None))
                except Exception:
                    eq = a.eq(b)
                bad = (~eq & ~(a.isna() & b.isna())).sum()
                if bad:
                    mismatch.append((c, int(bad)))
            if mismatch:
                print(f"FAIL {name}: value mismatches {mismatch}")
                for c, _ in mismatch[:2]:
                    d = spark_df[c].compare(duck_df[c]).head(3)
                    print(d.to_string())
                n_bad += 1
            else:
                print(f"OK   {name} ({len(spark_df)} rows)"); n_ok += 1
        except Exception as e:
            print(f"FAIL {name}: compare error {e}"); n_bad += 1
    # rows-only queries
    for name in [x.split('/')[-1] for x in glob.glob(f"{out_dir}/q*")]:
        if name not in oracles and (not only or name in only):
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
