#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify output (parquet per query) against the DuckDB oracle SQL in
oracle_sql.json, comparing schema + row multiset exactly (columns sorted by
name, rows sorted). Usage:

    python tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                raise AssertionError(
                    f"columns {list(g.columns)} != {list(w.columns)}")
            if [str(t) for t in g.dtypes] != [str(t) for t in w.dtypes]:
                raise AssertionError(
                    f"dtypes {list(g.dtypes)} != {list(w.dtypes)}")
            if len(g) != len(w):
                raise AssertionError(f"rows {len(g)} != {len(w)}")
            if not g.equals(w):
                neq = (g != w) & ~(g.isna() & w.isna())
                bad = neq.any(axis=1)
                raise AssertionError(
                    "value mismatch, first diffs:\n"
                    f"got:\n{g[bad].head(3)}\nwant:\n{w[bad].head(3)}")
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
