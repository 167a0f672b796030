#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (NOT part of the
library): run graft.Verify first, then this script. It loads each
<outDir>/<name> spark parquet result, runs the matching oracle_sql.json
entry in DuckDB over the same sf tables, sorts columns by name and rows
by all columns, and compares values exactly (with a float near-miss
diagnostic so rounding traps are visible).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    return df.sort_values(by=cols, ignore_index=True)


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if a != a and b != b:  # NaN-ish (pandas NaT etc.)
            return True
    except Exception:
        pass
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf())
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: load error: {e}")
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} oracle={list(exp.columns)}")
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            continue
        bad = []
        for c in got.columns:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if not cells_equal(a, b):
                    near = (
                        isinstance(a, float)
                        and isinstance(b, float)
                        and abs(a - b) <= 1e-6 * max(1.0, abs(a), abs(b))
                    )
                    bad.append((c, i, a, b, "NEAR" if near else "FAR"))
                    if len(bad) > 4:
                        break
            if len(bad) > 4:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell mismatches, first: {bad[:4]}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows, {len(got.columns)} cols)")
    print(f"== {n_pass}/{len(oracle)} passed ==")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
