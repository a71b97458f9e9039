#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: parity_check.py <sfDir> <verifyOutDir>

For each query parquet in verifyOutDir, runs the matching oracle SQL from
oracle_sql.json in DuckDB over the sfDir tables, sorts columns by name,
sorts rows, and compares row count, schema-ish, and a value hash.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import hashlib

sfdir, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

con = duckdb.connect()
for t in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(t)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def vhash(df: pd.DataFrame) -> str:
    s = df.to_csv(index=False, float_format="%.6g")
    return hashlib.md5(s.encode()).hexdigest()

fails = 0
for name, sql in sorted(oracle.items()):
    pdir = os.path.join(outdir, name)
    files = glob.glob(os.path.join(pdir, "*.parquet"))
    if not files:
        print(f"{name}: MISSING spark result"); fails += 1; continue
    spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
    duck_df = canon(con.execute(sql).df())
    ok_rows = len(spark_df) == len(duck_df)
    ok_cols = list(spark_df.columns) == list(duck_df.columns)
    ok_hash = ok_rows and ok_cols and vhash(spark_df) == vhash(duck_df)
    status = "OK" if ok_hash else "FAIL"
    if not ok_hash:
        fails += 1
        print(f"{name}: {status} rows {len(spark_df)}/{len(duck_df)} cols "
              f"{list(spark_df.columns)} vs {list(duck_df.columns)}")
        if ok_rows and ok_cols:
            for c in spark_df.columns:
                if not spark_df[c].astype(str).equals(duck_df[c].astype(str)):
                    merged = pd.DataFrame({"spark": spark_df[c], "duck": duck_df[c]})
                    diff = merged[merged.spark.astype(str) != merged.duck.astype(str)]
                    print(f"  col {c}: {len(diff)} diffs, head:\n{diff.head(3)}")
    else:
        print(f"{name}: OK ({len(spark_df)} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
