#!/usr/bin/env python3
"""Local stand-in for the driver's oracle gate (measurement/verification
only; the driver runs its own copy). Usage:

  python3 scripts/selfcheck.py <verifyOutDir> <sfDir> [query ...]

<verifyOutDir> is the output of `runMain graft.Verify <sfDir> <outDir> [qs]`:
per-query parquet dirs plus oracle_sql.json. Compares each query's Spark
rows against the DuckDB oracle as sorted multisets (rows + exact values).
"""
import duckdb, json, sys, glob, os

outdir, sfdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
qs = sys.argv[3:] or sorted(
    d for d in os.listdir(outdir)
    if os.path.isdir(os.path.join(outdir, d)))

con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

fail = 0
for q in qs:
    pq = os.path.join(outdir, q, "*.parquet")
    if not glob.glob(pq):
        print(f"{q}: MISSING spark output"); fail += 1; continue
    if q not in oracle:
        print(f"{q}: no oracle sql (rows-only)"); continue
    try:
        s = con.sql(f"SELECT * FROM read_parquet('{pq}')")
        scols = s.columns
        o = con.sql(oracle[q])
        if [c.lower() for c in o.columns] != [c.lower() for c in scols]:
            print(f"{q}: SCHEMA MISMATCH spark={scols} oracle={o.columns}")
            fail += 1
            continue
        order = ", ".join(f'"{c}"' for c in scols)
        srows = con.sql(
            f"SELECT * FROM read_parquet('{pq}') ORDER BY {order}").fetchall()
        orows = con.sql(
            f"SELECT * FROM ({oracle[q]}) ORDER BY {order}").fetchall()
        if len(srows) != len(orows):
            print(f"{q}: ROWS MISMATCH spark={len(srows)} oracle={len(orows)}")
            fail += 1
        elif srows != orows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, orows))
                       if a != b)
            print(f"{q}: VALUE MISMATCH at row {bad}: "
                  f"spark={srows[bad]} oracle={orows[bad]}")
            fail += 1
        else:
            print(f"{q}: OK rows={len(srows)}")
    except Exception as e:
        print(f"{q}: ERROR {e}")
        fail += 1
sys.exit(1 if fail else 0)
