#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each SparkEntry query,
load the Verify-dumped parquet and compare against the DuckDB oracle SQL
(row-sorted, column-name-sorted), mirroring CORRECTNESS_r{N}.json semantics.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>
(Driver-side tooling only — not part of the shipped library.)
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cell_eq(a, b) -> bool:
    # EXACT canonical compare, mirroring the driver's hash: the driver
    # stringifies pandas cells, so DuckDB HUGEINT->float64 ("5.0") must NOT
    # equal Spark int64 ("5"). No isclose — a dtype mismatch is a real fail.
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        qdir = os.path.join(out_dir, name)
        try:
            got = canon(pd.concat(
                [pd.read_parquet(f) for f in sorted(glob.glob(f"{qdir}/*.parquet"))]))
            exp = canon(con.execute(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        bad = None
        for col in got.columns:
            gv, ev = got[col].tolist(), exp[col].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if not cell_eq(a, b):
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        if bad:
            col, i, a, b = bad
            print(f"FAIL {name}: first diff col={col} row={i}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows, {len(got.columns)} cols)")
            n_pass += 1
    missing = set(os.listdir(out_dir)) - set(oracle) - {"oracle_sql.json"}
    if missing:
        print(f"note: query dirs without oracle (rows-only check): {sorted(missing)}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
