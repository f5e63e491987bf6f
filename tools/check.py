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
    bad_counts = check_counts(oracle)
    return 1 if (n_fail or bad_counts) else 0


def check_counts(oracle):
    """Entry-count invariants (VERDICT r12 #6): the declared query set
    (oracle_sql.json — Verify always dumps the FULL map), the README's
    advertised count, BENCH_LOCAL.md's latest header, and
    BENCH_QUERIES.json's self-declared _nqueries must all agree — five
    regen passes in round 12 each changed counts and the headers had to
    be hand-corrected twice. Prints one loud line per disagreement and
    fails the gate. Header checks are skipped gracefully when the file
    doesn't carry the expected marker (a fresh repo), never silently when
    it does.
    """
    import os
    import re
    n = len(oracle)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bad = 0

    def complain(what, got):
        nonlocal bad
        print(f"COUNT-MISMATCH {what}: declares {got}, "
              f"oracle_sql.json has {n} queries")
        bad += 1

    readme = os.path.join(here, "README.md")
    if os.path.exists(readme):
        m = re.search(r"(\d+) queries hash-compared", open(readme).read())
        if m and int(m.group(1)) != n:
            complain("README.md", int(m.group(1)))

    bl = os.path.join(here, "BENCH_LOCAL.md")
    if os.path.exists(bl):
        # whitespace-tolerant: markdown reflows can break the phrase
        # across lines
        m = re.search(r"(\d+)\s+oracle\s+entries", open(bl).read())
        if m and int(m.group(1)) != n:
            complain("BENCH_LOCAL.md latest header", int(m.group(1)))

    bq = os.path.join(here, "BENCH_QUERIES.json")
    if os.path.exists(bq):
        decl = json.load(open(bq)).get("_nqueries")
        if decl is not None and int(decl) != n:
            complain("BENCH_QUERIES.json _nqueries", int(decl))

    if bad == 0:
        print(f"COUNTS OK ({n} queries declared everywhere)")
    return bad


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
