#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_local.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dump written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over views named after the parquet
tables in <sfDir>, and compares: column names, row count, and exact values
(bitwise for floats) after sorting columns by name and rows by all columns.
Dev tool only — not part of the shipped library.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            exp = con.execute(sql).fetchdf()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            exp = exp.reindex(sorted(exp.columns), axis=1)
            got = got.reindex(sorted(got.columns), axis=1)
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {name}: columns exp={list(exp.columns)} "
                      f"got={list(got.columns)}")
                n_fail += 1
                continue
            if len(exp) != len(got):
                print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
                n_fail += 1
                continue
            cols = list(exp.columns)
            exp_s = exp.sort_values(cols).reset_index(drop=True)
            got_s = got.sort_values(cols).reset_index(drop=True)
            # dtype skew (e.g. DuckDB SUM(int) -> HUGEINT vs Spark bigint)
            # passes the value compare below but fails the driver's hash —
            # surface it loudly
            for c in cols:
                if str(exp_s[c].dtype) != str(got_s[c].dtype):
                    print(f"WARN {name}: dtype skew on '{c}' "
                          f"oracle={exp_s[c].dtype} spark={got_s[c].dtype}")
            mism = []
            for c in cols:
                a, b = exp_s[c], got_s[c]
                try:
                    eq = (a == b) | (a.isna() & b.isna())
                except Exception:
                    eq = a.astype(str) == b.astype(str)
                if not eq.all():
                    i = (~eq).idxmax()
                    mism.append((c, a[i], b[i]))
            if mism:
                print(f"FAIL {name}: value mismatches {mism[:3]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(exp)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
