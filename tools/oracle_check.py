#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB with views over <sfDir>/*.parquet, and
compares: row count, column names (sorted), and a hash of values with
columns sorted by name and rows sorted canonically.

Dev tool only — NOT part of the Scala library (driver-side python deps).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    # sort columns by name, then rows by all columns' string repr
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort(key=lambda r: tuple(str(x) for x in r))
    return cols, rows


def norm(v):
    import math
    import numpy as np
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, np.ndarray):
        return tuple(norm(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    if isinstance(v, (float, np.floating)):
        return ("f", float(v))   # dtype-strict: int64 5 != float64 5.0
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify.scala emits every oracle under both "<name>" and "<name>.parquet"
    # (the driver keys by file name); check each query once, by bare name.
    oracle = {k: v for k, v in oracle.items() if not k.endswith(".parquet")}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}.parquet/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        wc, wr = canon(want)
        gc, gr = canon(got)
        if wc != gc:
            print(f"FAIL {name}: columns differ\n  duck:  {wc}\n  spark: {gc}")
            n_fail += 1
        elif len(wr) != len(gr):
            print(f"FAIL {name}: rows {len(gr)} (spark) vs {len(wr)} (duck)")
            n_fail += 1
        elif wr != gr:
            bad = next(i for i, (a, b) in enumerate(zip(wr, gr)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad}:\n"
                  f"  duck:  {wr[bad]}\n  spark: {gr[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
