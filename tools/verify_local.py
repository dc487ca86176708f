#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/verify_local.py <outDir> <sfDir>

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
For each query dir under outDir, loads the Spark parquet result and runs the
matching oracle SQL from oracle_sql.json in DuckDB (tables registered as
views over <sfDir>/*.parquet), then compares row counts, sorted values, and
schemas. Exit code 0 iff everything matches.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything (lists, timestamps) for a stable sort+compare
    s = df.applymap(lambda v: repr(list(v)) if isinstance(v, (list, tuple)) or
                    str(type(v)).find('ndarray') >= 0 else repr(v))
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    return s

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, bad, rows_only = [], [], []
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            bad.append((name, "no spark output")); continue
        spark_df = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracle:
            rows_only.append((name, len(spark_df)))
            if len(spark_df) == 0:
                bad.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            oracle_df = con.execute(oracle[name]).df()
        except Exception as e:
            bad.append((name, f"oracle SQL failed: {e}")); continue
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            bad.append((name, f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"))
        elif len(a) != len(b):
            bad.append((name, f"row count: spark={len(a)} oracle={len(b)}"))
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            idx = neq[neq].index[:3]
            diffs = [f"row {i}: spark={a.loc[i].to_dict()} oracle={b.loc[i].to_dict()}" for i in idx]
            bad.append((name, "values differ; " + " | ".join(diffs)))
        else:
            ok.append(name)
    print(f"PASS: {len(ok)}  ROWS-ONLY: {len(rows_only)}  FAIL: {len(bad)}")
    for n in ok: print(f"  ok {n}")
    for n, r in rows_only: print(f"  rows-only {n} ({r} rows)")
    for n, msg in bad: print(f"  FAIL {n}: {msg}")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
