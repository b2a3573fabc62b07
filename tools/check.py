#!/usr/bin/env python3
"""Local self-check harness mimicking the driver's t2 gate FAITHFULLY.

Usage: python3 tools/check.py <sfDir> <outDir> [key ...]

The real driver reads the Spark parquet output through *pandas* (pyarrow
backend: DECIMAL columns surface as Python Decimal objects, arrays as
numpy.ndarray) but reads the DuckDB oracle result through *duckdb .df()*
(DECIMAL surfaces as float64).  It then sorts both frames with pandas over
all columns (sorted by name) and hash-compares cell values.  Round 1 was
lost to a local checker that read BOTH sides through DuckDB, unifying the
representations — this rewrite mirrors the driver's asymmetric readers so
a Decimal-vs-float64 split (or an unsortable ndarray column) fails HERE
first, not in the driver.
"""
import sys, json, glob, math, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell(v):
    """Driver-faithful cell fingerprint: the *representation* matters.

    A Python Decimal and a float64 of equal value must NOT compare equal
    (that is exactly the class of bug the driver's hash catches)."""
    if v is None:
        return ("null",)
    if isinstance(v, float) and math.isnan(v):
        return ("nan",)
    if v is pd.NaT:
        return ("null",)
    if isinstance(v, Decimal):
        return ("decimal", str(v))
    if isinstance(v, (np.floating, float)):
        return ("float", repr(float(v)))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return ("int", int(v))
    if isinstance(v, (np.bool_, bool)):
        return ("bool", bool(v))
    if isinstance(v, pd.Timestamp):
        return ("ts", v.isoformat())
    if isinstance(v, datetime.datetime):
        return ("ts", pd.Timestamp(v).isoformat())
    if isinstance(v, datetime.date):
        # The driver hashes DATE equal to its midnight TIMESTAMP (fn_date
        # passed round 1 with Spark date vs duckdb .df() datetime64).
        return ("ts", pd.Timestamp(v).isoformat())
    if isinstance(v, bytes):
        return ("bytes", v.hex())
    if isinstance(v, (np.ndarray, list, tuple)):
        return ("list", tuple(cell(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, cell(x)) for k, x in v.items())))
    return (type(v).__name__, str(v))


def frame_rows(df):
    # pandas sort over all columns (sorted by name) — the driver does the
    # same, and it CRASHES on ndarray cells; we deliberately do not guard.
    cols = sorted(df.columns)
    df = df[cols]
    if len(cols) and len(df):
        df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return [tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]


CONTAINMENT_PAT = __import__("re").compile(
    r"cov_smp AS \(SELECT DISTINCT p\.chromosome, p\.position,\s*"
    r"c\.sample_id, c\.pool_size\s*"
    r"FROM pts p JOIN cov_f c ON p\.chromosome = c\.chromosome\s*"
    r"AND p\.position BETWEEN c\.begin_pos AND c\.end_pos\)")
CONTAINMENT_BINNED = (
    "cov_smp AS (SELECT DISTINCT p.chromosome, p.position, "
    "c.sample_id, c.pool_size "
    "FROM pts p JOIN (SELECT c2.*, "
    "unnest(range(c2.begin_pos // 2048, c2.end_pos // 2048 + 1)) AS bkt "
    "FROM cov_f c2) c "
    "ON p.chromosome = c.chromosome AND (p.position // 2048) = c.bkt "
    "AND p.position BETWEEN c.begin_pos AND c.end_pos)")


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args) or args[i + 1].startswith("--"):
            sys.exit("usage: --json <path> needs a value")
        json_out = args[i + 1]
        del args[i:i + 2]
    # --binned-containment: rewrite the oracle's naive point-in-interval
    # join to the 2^11-bucket equi-join + residual BETWEEN (the same
    # PropertySpec-pinned acceleration the engine uses; row-identical by
    # construction, asserted at sf0.01).  DuckDB's plain plan hash-joins
    # on the 22-value chromosome key and filter-scans ~1e10 pairs at
    # sf1; the binned form makes the corpus-scale oracle sweep feasible.
    binned = "--binned-containment" in args
    if binned:
        args.remove("--binned-containment")
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata ships single files; GenScale corpora are
        # Spark-written directories of part files
        p = f"{sf_dir}/{t}.parquet"
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    failures = []
    results = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        if binned:
            sql, n_sub = CONTAINMENT_PAT.subn(CONTAINMENT_BINNED, sql)
            # drift guard: a frequency-key oracle that still declares the
            # cov_smp containment CTE but no longer matches the rewrite
            # pattern would silently run the quadratic plan and stall the
            # sf1 sweep — fail loudly instead.
            if n_sub == 0 and "cov_smp AS" in sql:
                sys.exit(f"--binned-containment: {name} declares cov_smp "
                         "but CONTAINMENT_PAT did not match — oracle SQL "
                         "drifted; update the pattern in tools/check.py")
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            failures.append(name)
            results[name] = {"pass": False, "err": "no spark output"}
            continue
        try:
            got_df = pd.concat([pd.read_parquet(f) for f in files],
                               ignore_index=True)
            exp_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: read: {type(e).__name__}: {e}")
            n_fail += 1
            failures.append(name)
            results[name] = {"pass": False, "err": f"read: {e}"}
            continue
        if sorted(got_df.columns) != sorted(exp_df.columns):
            print(f"FAIL {name}: columns spark={sorted(got_df.columns)} oracle={sorted(exp_df.columns)}")
            n_fail += 1
            failures.append(name)
            results[name] = {"pass": False, "err": "schema mismatch"}
            continue
        try:
            grows = frame_rows(got_df)
            erows = frame_rows(exp_df)
        except Exception as e:
            print(f"FAIL {name}: sort/compare: {type(e).__name__}: {e}")
            n_fail += 1
            failures.append(name)
            results[name] = {"pass": False, "err": f"sort/compare: {e}"}
            continue
        if grows == erows:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
            results[name] = {"pass": True, "rows": len(grows)}
        else:
            n_fail += 1
            failures.append(name)
            results[name] = {"pass": False, "err": "mismatch",
                             "spark_rows": len(grows), "oracle_rows": len(erows)}
            if len(grows) != len(erows):
                print(f"FAIL {name}: rowcount spark={len(grows)} oracle={len(erows)}")
            else:
                for i, (g, e) in enumerate(zip(grows, erows)):
                    if g != e:
                        print(f"FAIL {name}: first diff at row {i} (cols {sorted(got_df.columns)}):\n  spark : {g}\n  oracle: {e}")
                        break
    print(f"== {n_pass} pass, {n_fail} fail" + (f": {' '.join(failures)}" if failures else ""))
    if json_out:
        json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                   "keys": results}, open(json_out, "w"), indent=1)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
