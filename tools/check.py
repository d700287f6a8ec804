#!/usr/bin/env python3
"""Dev-only harness (NOT product code): mimic the driver's correctness
gate locally. Runs graft.Verify output against DuckDB oracles and
compares values with columns sorted by name and rows sorted.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    con = duckdb.connect()
    return con.execute(f"SELECT * FROM read_parquet({files!r})").df()


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failed = []
    for name in sorted(oracles):
        sdf = load_spark(outdir, name)
        if sdf is None:
            print(f"FAIL {name}: no spark output")
            failed.append(name)
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failed.append(name)
            continue
        s, o = norm(sdf.copy()), norm(odf.copy())
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
            failed.append(name)
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            failed.append(name)
            continue
        # exact compare, treating NaN==NaN
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
            print(f"OK   {name} ({len(s)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:500]}")
            failed.append(name)
    # also check rows-only queries (no oracle)
    for d in sorted(glob.glob(os.path.join(outdir, "*"))):
        name = os.path.basename(d)
        if os.path.isdir(d) and name not in oracles:
            sdf = load_spark(outdir, name)
            n = -1 if sdf is None else len(sdf)
            print(f"ROWS {name}: {n}")
    print(("ALL GREEN" if not failed else f"FAILED: {failed}"))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
