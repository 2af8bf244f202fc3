#!/usr/bin/env python3
"""Local pre-check of SparkEntry queries against the DuckDB oracle.

Mirrors the driver's correctness gate: run graft.Verify to dump each query's
result parquet + oracle_sql.json, then run each SQL in DuckDB over the same
testdata parquet and compare as column-name-sorted, row-sorted multisets.

Usage: python3 dev/oracle_check.py <sfdir> <outdir>   (after running Verify)
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything for a stable, type-insensitive compare
    def cell(v):
        if v is None or v != v:
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False))
    return list(df.columns), rows


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            exp_cols, exp_rows = normalize(con.execute(sql).fetchdf())
            got_cols, got_rows = normalize(
                con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failed.append(name)
            continue
        if exp_cols != got_cols:
            print(f"FAIL {name}: columns exp={exp_cols} got={got_cols}")
            failed.append(name)
        elif exp_rows != got_rows:
            diff_e = [r for r in exp_rows if r not in got_rows][:3]
            diff_g = [r for r in got_rows if r not in exp_rows][:3]
            print(f"FAIL {name}: {len(exp_rows)} exp vs {len(got_rows)} got rows")
            print(f"  only-expected: {diff_e}")
            print(f"  only-got:      {diff_g}")
            failed.append(name)
        else:
            print(f"OK   {name} ({len(got_rows)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
