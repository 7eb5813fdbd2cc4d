#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran (or run
with --run to invoke it). For each query: load Spark parquet result, run the
oracle SQL in DuckDB with testdata tables registered, compare row count,
column names, and a hash of the sorted rows.
"""
import sys, os, json, glob, subprocess
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df):
    # sort columns by name; normalize numeric dtypes (int* -> int64,
    # float* -> float64) so the value compare mirrors the driver's
    # value-level hash rather than tripping on int32-vs-int64 frames
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        k = df[c].dtype.kind
        if k in "iu":
            df[c] = df[c].astype("int64")
        elif k == "f":
            df[c] = df[c].astype("float64")
    return df

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    if "--run" in sys.argv:
        r = subprocess.run(["sbt", f'runMain graft.Verify {sf} {out}'],
                           cwd="/root/repo", capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-4000:]); print(r.stderr[-4000:]); sys.exit(1)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        pdir = f"{out}/{name}"
        if not glob.glob(f"{pdir}/*.parquet"):
            results[name] = "MISSING_SPARK_RESULT"; continue
        try:
            spark_df = con.sql(f"SELECT * FROM '{pdir}/*.parquet'").df()
        except Exception as e:
            results[name] = f"SPARK_READ_FAIL: {e}"; continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_FAIL: {type(e).__name__}: {e}"; continue
        sa, da = canon(spark_df), canon(duck_df)
        if list(sa.columns) != list(da.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(sa.columns)} duck={list(da.columns)}"
            continue
        if len(sa) != len(da):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(sa)} duck={len(da)}"
            continue
        # exact compare on sorted rows
        sa = sa.sort_values(list(sa.columns)).reset_index(drop=True)
        da = da.sort_values(list(da.columns)).reset_index(drop=True)
        if sa.equals(da):
            results[name] = "OK"
        else:
            neq = (sa != da) & ~(sa.isna() & da.isna())
            bad = neq.any(axis=1)
            nbad = int(bad.sum())
            if nbad == 0:
                # canon() already unified numeric dtypes; a residual diff
                # here is non-numeric (e.g. object vs category) — fail it
                dt = [f"{c}: {sa[c].dtype}/{da[c].dtype}" for c in sa.columns
                      if sa[c].dtype != da[c].dtype]
                results[name] = f"DTYPE_MISMATCH {dt}"
            else:
                i = bad.idxmax()
                ex = f" first spark={sa.loc[i].to_dict()} duck={da.loc[i].to_dict()}"
                results[name] = f"VALUE_MISMATCH rows={nbad}{ex}"
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in sorted(results.items()):
        print(("PASS " if v.startswith("OK") else "FAIL ") + k +
              ("" if v == "OK" else f" :: {v}"))
    print(f"== {ok}/{len(results)} OK")
    sys.exit(0 if ok == len(results) else 2)

if __name__ == "__main__":
    main()
