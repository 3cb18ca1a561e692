#!/usr/bin/env python3
"""Driver-style DuckDB oracle compare over a graft.Verify output dir.

Usage: python3 tools/oracle_check.py <verify_out_dir> [sf_dir]

For every query in <out>/oracle_sql.json: load the Spark parquet output,
run the oracle SQL in DuckDB over the raw sf tables, and compare row
count, sorted column names, and the sorted stringified values (the
driver's rows/schema/hash checks). Prints one line per failure and a
final tally; exit 0 iff all match.
"""
import duckdb, json, sys, os

out = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok = bad = 0
fails = []
for name, sql in sorted(oracle.items()):
    try:
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
        odf = con.execute(sql).fetchdf()
        rows = len(sdf) == len(odf)
        schema = sorted(map(str.lower, sdf.columns)) == \
                 sorted(map(str.lower, odf.columns))
        if rows and schema:
            cols = sorted(sdf.columns, key=str.lower)
            ocols = sorted(odf.columns, key=str.lower)
            a = sorted(tuple(str(v) for v in r)
                       for r in sdf[cols].itertuples(index=False))
            b = sorted(tuple(str(v) for v in r)
                       for r in odf[ocols].itertuples(index=False))
            hashm = a == b
        else:
            hashm = False
        if rows and schema and hashm:
            ok += 1
        else:
            bad += 1
            fails.append(name)
            print(f"FAIL {name}: rows={rows} ({len(sdf)}/{len(odf)}) "
                  f"schema={schema} hash={hashm}")
    except Exception as e:
        bad += 1
        fails.append(name)
        print(f"ERROR {name}: {e}")

print(f"oracle: {ok}/{ok + bad} match")
sys.exit(0 if bad == 0 else 1)
