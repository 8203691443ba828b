#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares: columns sorted by name, rows sorted by all columns, exact value
equality (with a float report at 1e-9 relative tolerance so we can tell
"wrong" from "last-ulp drift").
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, True
        exact = a == b
        approx = abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
        return exact, approx
    e = a == b
    return e, e


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:  # filtered Verify run: only these queries have outputs
        oracle = {k: v for k, v in oracle.items() if k in only}
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            failures += 1
            continue
        try:
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        gc, gr = canon(got_rows, got_cols)
        wc, wr = canon(want_rows, want_cols)
        if gc != wc:
            print(f"FAIL {name}: columns differ: spark={gc} oracle={wc}")
            failures += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: row count differs: spark={len(gr)} oracle={len(wr)}")
            failures += 1
            continue
        n_exact_bad = 0
        n_approx_bad = 0
        first_bad = None
        for a, b in zip(gr, wr):
            for x, y in zip(a, b):
                ex, ap = eq(x, y)
                if not ex:
                    n_exact_bad += 1
                    if not ap:
                        n_approx_bad += 1
                        if first_bad is None:
                            first_bad = (a, b)
        if n_approx_bad:
            print(f"FAIL {name}: {n_approx_bad} cells differ beyond tolerance; "
                  f"first: spark={first_bad[0]} oracle={first_bad[1]}")
            failures += 1
        elif n_exact_bad:
            print(f"WARN {name}: rows={len(gr)} OK approx but {n_exact_bad} "
                  f"cells differ in last ulps (hash would MISMATCH)")
            failures += 1
        else:
            print(f"OK   {name}: rows={len(gr)} exact match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    # optional 3rd arg: comma-separated query-name filter (mirrors
    # graft.Verify's filter arg for fast local iteration)
    main(sys.argv[1], sys.argv[2],
         set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None)
