#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: oracle_check.py <sfDir> <verifyOutDir> [--json <out.json>] [--budget <sec>]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB with views over <sfDir>/*.parquet, and
compares: row count, column names (sorted), and a hash of values with
columns sorted by name and rows sorted canonically.

Each query's DuckDB wall time is printed; queries slower than --budget
seconds (default 30 — the r15 lesson: slow oracles starve the driver's
correctness window and zero the round's gate) are flagged SLOW and count
as failures. --json writes a machine-readable record (per-query status +
oracle seconds + pass/fail totals) for committing next to the round stamp.

Dev tool only — NOT part of the Scala library (driver-side python deps).
"""
import json
import sys
import time

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
    json_out = None
    budget = 30.0
    argv = sys.argv[3:]
    while argv:
        if argv[0] == "--json":
            json_out = argv[1]
            argv = argv[2:]
        elif argv[0] == "--budget":
            budget = float(argv[1])
            argv = argv[2:]
        else:
            raise SystemExit(f"unknown arg {argv[0]}")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify.scala emits every oracle under both "<name>" and "<name>.parquet"
    # (the driver keys by file name); check each query once, by bare name.
    oracle = {k: v for k, v in oracle.items() if not k.endswith(".parquet")}
    n_pass = n_fail = 0
    record = {}

    def note(name, status, sec, detail=""):
        record[name] = {"status": status, "oracle_sec": round(sec, 2)}
        if detail:
            record[name]["detail"] = detail

    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            note(name, "duckdb_error", time.time() - t0, str(e)[:200])
            n_fail += 1
            continue
        sec = time.time() - t0
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}.parquet/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            note(name, "spark_unreadable", sec, str(e)[:200])
            n_fail += 1
            continue
        wc, wr = canon(want)
        gc, gr = canon(got)
        slow = sec > budget
        if wc != gc:
            print(f"FAIL {name}: columns differ\n  duck:  {wc}\n  spark: {gc}")
            note(name, "columns_differ", sec)
            n_fail += 1
        elif len(wr) != len(gr):
            print(f"FAIL {name}: rows {len(gr)} (spark) vs {len(wr)} (duck)")
            note(name, "rows_differ", sec)
            n_fail += 1
        elif wr != gr:
            bad = next(i for i, (a, b) in enumerate(zip(wr, gr)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad}:\n"
                  f"  duck:  {wr[bad]}\n  spark: {gr[bad]}")
            note(name, "values_differ", sec)
            n_fail += 1
        elif slow:
            print(f"SLOW {name} ({len(gr)} rows, oracle {sec:.1f}s > "
                  f"budget {budget:.0f}s)")
            note(name, "slow_oracle", sec)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows, {sec:.1f}s)")
            note(name, "pass", sec)
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    if json_out:
        total_sec = round(sum(r["oracle_sec"] for r in record.values()), 1)
        with open(json_out, "w") as f:
            json.dump({"n_pass": n_pass, "n_fail": n_fail,
                       "budget_sec": budget, "oracle_total_sec": total_sec,
                       "queries": record}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
