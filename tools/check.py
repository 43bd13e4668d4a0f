#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tooling only; the
shipped engine is the Scala code under src/).

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads outDir/<name>/ parquet written by graft.Verify, runs the matching
oracle SQL from outDir/oracle_sql.json in DuckDB over the sfDir tables,
and compares row count, column names, and (column-name-sorted, row-sorted)
values."""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_result(path):
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return None
    return pq.read_table(files[0] if len(files) == 1 else path).to_pandas()

def canon(df):
    df = df[sorted(df.columns)]
    # normalize dtypes for compare: timestamps → iso strings; integer
    # widths upcast to int64 and float32 → float64 (the driver tolerates
    # width drift, NOT int-vs-float — a HUGEINT sum fetched as float64
    # against Spark's int64 is a real driver hash fail).
    out = df.copy()
    for c in out.columns:
        dt = str(out[c].dtype)
        if dt.startswith("datetime"):
            out[c] = out[c].astype("datetime64[us]").astype(str)
        elif out[c].dtype == object:
            out[c] = out[c].astype(str)
        elif dt.startswith(("int", "uint")):
            out[c] = out[c].astype("int64")
        elif dt == "float32":
            out[c] = out[c].astype("float64")
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = [d for d in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, d))]
    n_pass = n_fail = 0
    for name in names:
        if only and name not in only:
            continue
        got = load_result(os.path.join(out_dir, name))
        if got is None:
            print(f"FAIL {name}: no result parquet"); n_fail += 1; continue
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status} {name}: {len(got)} rows")
            n_pass += len(got) > 0; n_fail += len(got) == 0
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}"); n_fail += 1; continue
        # STRICT compare: the driver hashes the value representation, so an
        # int64-vs-float64 drift (e.g. DuckDB HUGEINT sums fetched as
        # float64) is a FAIL even when values are numerically equal.
        # Round 1 shipped 4 such fails under the old rtol-only compare.
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=True,
                                          check_exact=True)
            print(f"PASS {name}: {len(g)} rows"); n_pass += 1
        except AssertionError as ex:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                              check_exact=False,
                                              rtol=1e-9, atol=1e-9)
                print(f"FAIL {name}: dtype/bit drift (values equal under "
                      f"rtol — driver hash would differ)\n{str(ex)[:300]}")
            except AssertionError:
                print(f"FAIL {name}: value mismatch\n{str(ex)[:500]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
