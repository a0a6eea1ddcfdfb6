#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: for each dumped
query result, executes the oracle SQL in DuckDB over the same parquet
tables and compares row count, schema (column names), and a row-order- and
column-order-insensitive value hash (columns sorted by name, rows sorted).
"""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = os.path.join(out_dir, name)
    try:
        got = con.execute(
            f"SELECT * FROM '{spark_dir}/*.parquet'").fetchdf()
        want = con.execute(sql).fetchdf()
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}"); fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); fail += 1; continue
        g = got[gc].sort_values(gc).reset_index(drop=True)
        w = want[wc].sort_values(wc).reset_index(drop=True)
        gh = [tuple(str(x) for x in r) for r in g.itertuples(index=False)]
        wh = [tuple(str(x) for x in r) for r in w.itertuples(index=False)]
        if gh != wh:
            bad = [i for i, (a, b) in enumerate(zip(gh, wh)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at rows {bad}")
            for i in bad:
                print(f"  spark={gh[i]}\n  duck ={wh[i]}")
            fail += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    except Exception as e:
        print(f"ERR  {name}: {e}"); fail += 1
queries_without_oracle = set()
sys.exit(1 if fail else 0)
