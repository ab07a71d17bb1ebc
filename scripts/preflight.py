#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/preflight.py <outDir> <sfDir> [query ...]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, and compares: row count, column names/types,
and exact cell values after sorting columns by name and rows by all
columns. Reports per-query PASS/FAIL with first differing cells.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable row sort across dtypes
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)

def cells_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if np.isnan(fa) and np.isnan(fb):
            return True
        return fa == fb  # exact: determinism is the whole point
    return str(a) == str(b)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for name in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        t = os.path.basename(name)[:-8]
        # directory-shaped tables (e.g. the ScaleUp sf1 replica) need a glob
        src = f"{name}/*.parquet" if os.path.isdir(name) else name
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
        if t == "events":
            # the ScaleUp replica stores ts as plain INT64 nanos (Spark
            # cannot write TIMESTAMP_NS); normalize to the same µs-floored
            # timestamp Tables.events produces so oracles are scale-agnostic
            (ts_type,) = [r[1] for r in con.execute(f"DESCRIBE {t}").fetchall()
                          if r[0] == "ts"]
            if ts_type == "BIGINT":
                con.execute(f"""CREATE OR REPLACE VIEW {t} AS
                    SELECT * REPLACE (make_timestamp(ts // 1000) AS ts)
                    FROM read_parquet('{src}')""")
    n_pass = n_fail = 0
    for qname in sorted(oracles):
        if only and qname not in only:
            continue
        spark_path = os.path.join(out_dir, qname)
        if not os.path.isdir(spark_path):
            print(f"FAIL {qname}: no spark output at {spark_path}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
            want = con.execute(oracles[qname]).df()
        except Exception as e:
            print(f"FAIL {qname}: exec error: {e}")
            n_fail += 1
            continue
        got_n, want_n = norm(got), norm(want)
        problems = []
        if list(got_n.columns) != list(want_n.columns):
            problems.append(f"columns spark={list(got_n.columns)} oracle={list(want_n.columns)}")
        elif len(got_n) != len(want_n):
            problems.append(f"rows spark={len(got_n)} oracle={len(want_n)}")
        else:
            bad = 0
            for c in got_n.columns:
                ga, wa = got_n[c].values, want_n[c].values
                for i in range(len(ga)):
                    if not cells_equal(ga[i], wa[i]):
                        if bad < 3:
                            problems.append(f"cell [{i}].{c}: spark={ga[i]!r} oracle={wa[i]!r}")
                        bad += 1
            if bad:
                problems.append(f"... {bad} differing cells total")
        if problems:
            n_fail += 1
            print(f"FAIL {qname} ({len(got_n)} rows)")
            for p in problems[:6]:
                print(f"     {p}")
        else:
            n_pass += 1
            print(f"PASS {qname} ({len(got_n)} rows)")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
