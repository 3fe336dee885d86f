#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each query's parquet
against its DuckDB oracle (column-sorted, row-sorted value compare).

Usage: python3 tools/selfcheck.py [sfDir] [outDir]

Dev tooling only — the Spark library itself has no python/duckdb dependency.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-verify"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out}/oracle_sql.json"))
# optional third arg: comma-separated query filter — the full sf0.1 pass
# spends >1h in the heavy LSH/simhash SQL oracles, so iterate focused
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
ok = fail = 0
for q in sorted(os.listdir(out)):
    d = os.path.join(out, q)
    if not os.path.isdir(d):
        continue
    if only is not None and q not in only:
        continue
    eng = duckdb.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    if q not in oracles:
        status = f"rows-only ({len(eng)} rows)"
        if len(eng) == 0:
            status += "  *** EMPTY ***"
            fail += 1
        else:
            ok += 1
        print(f"{q:24s} {status}")
        continue
    ora = con.sql(oracles[q]).df()
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(list(df.columns)).reset_index(drop=True)
    e, o = norm(eng), norm(ora)
    if list(e.columns) != list(o.columns):
        print(f"{q:24s} FAIL cols: engine={list(e.columns)} oracle={list(o.columns)}")
        fail += 1
        continue
    if len(e) != len(o):
        print(f"{q:24s} FAIL rows: engine={len(e)} oracle={len(o)}")
        fail += 1
        continue
    try:
        # dtype-sensitive (mirrors the driver's type-sensitive hash): a
        # DECIMAL column on one side vs DOUBLE on the other must FAIL here.
        pd.testing.assert_frame_equal(e, o, check_dtype=True, check_exact=True)
        print(f"{q:24s} OK ({len(e)} rows)")
        ok += 1
    except AssertionError as ex:
        print(f"{q:24s} FAIL values: {str(ex).splitlines()[-1][:160]}")
        fail += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
