#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: for each query dumped
by graft.Verify, run the oracle SQL in DuckDB over the same parquet tables
and compare values (columns sorted by name, rows sorted by all columns).

Usage: verify_local.py <sfDir> <outDir>
"""
import json
import sys
import glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=True)
            # Driver hashes STRING-RENDERED values, so an int/float dtype
            # mismatch (e.g. DuckDB HUGEINT -> 44820.0 vs Spark BIGINT ->
            # 44820) fails there even when values compare equal here.
            gs, ws = g.astype(str), w.astype(str)
            if not gs.equals(ws):
                diff = (gs != ws).any(axis=0)
                bad = list(diff[diff].index)
                raise AssertionError(
                    f"rendered-value mismatch (dtype class) in columns {bad}: "
                    f"spark={gs[bad].iloc[0].to_dict()} "
                    f"duckdb={ws[bad].iloc[0].to_dict()}")
            print(f"PASS {name}: {len(g)} rows")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch:\n{str(e)[:1500]}")
            # show first differing rows
            for i in range(min(len(g), len(w))):
                if not g.iloc[i].equals(w.iloc[i]):
                    print("  spark :", g.iloc[i].to_dict())
                    print("  duckdb:", w.iloc[i].to_dict())
                    break
            failures += 1
    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(oracle)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
