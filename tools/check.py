#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output vs
DuckDB oracle on the same parquet tables. Usage:
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out [query ...]
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            print(f"MISS  {name}: no spark output")
            n_fail += 1
            continue
        try:
            sdf = con.execute(f"SELECT * FROM read_parquet('{spark_glob}')").fetchdf()
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ERR   {name}: {e}")
            n_fail += 1
            continue
        sdf = sdf.reindex(sorted(sdf.columns), axis=1)
        odf = odf.reindex(sorted(odf.columns), axis=1)
        if list(sdf.columns) != list(odf.columns):
            print(f"FAIL  {name}: columns spark={list(sdf.columns)} oracle={list(odf.columns)}")
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rows spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            continue
        svals = sorted(map(tuple, sdf.astype(str).values.tolist()))
        ovals = sorted(map(tuple, odf.astype(str).values.tolist()))
        if svals == ovals:
            print(f"PASS  {name} ({len(sdf)} rows)")
            n_pass += 1
        else:
            diffs = [(a, b) for a, b in zip(svals, ovals) if a != b][:3]
            print(f"FAIL  {name}: value mismatch; first diffs: {diffs}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
