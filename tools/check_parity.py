#!/usr/bin/env python3
"""Local dev harness approximating the driver's t2 correctness gate.

Usage: python3 tools/check_parity.py <sfDir> <outDir>

Expects `graft.Verify <sfDir> <outDir>` to have run already (each query's
result at <outDir>/<name>/*.parquet plus <outDir>/oracle_sql.json). Runs each
oracle SQL in DuckDB against views named after the fixture tables, and
compares against the Spark output: column names (sorted), row count, and
exact values both in-order and as a sorted multiset.

Dev-only tool (driver-side python has duckdb/pandas); the shipped library is
pure Scala/Spark and does not depend on this.
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list,)) else v)
    return df


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
        got = norm(con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf())
        try:
            want = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        in_order = got.reset_index(drop=True).equals(want.reset_index(drop=True))
        gs = got.sort_values(list(got.columns)).reset_index(drop=True)
        ws = want.sort_values(list(want.columns)).reset_index(drop=True)
        unordered = gs.equals(ws)
        if in_order:
            print(f"PASS {name} ({len(got)} rows)")
        elif unordered:
            print(f"WARN {name}: values match only after sorting rows "
                  f"({len(got)} rows) — add a total ORDER BY")
        else:
            diff = (gs != ws) & ~(gs.isna() & ws.isna())
            cols = [c for c in gs.columns if diff[c].any()]
            print(f"FAIL {name}: value mismatch in columns {cols}")
            for c in cols[:3]:
                i = diff[c].idxmax()
                print(f"  {c}[{i}]: spark={gs[c][i]!r} oracle={ws[c][i]!r}")
            failures += 1
    queries_without_oracle = set()
    print(f"\n{len(oracle)} oracle-checked, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
