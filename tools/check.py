#!/usr/bin/env python3
"""Local self-check harness mimicking the driver's t2 gate.

Usage: python3 tools/check.py <sfDir> <outDir> [key ...]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against views
over <sfDir>/*.parquet, and compares values exactly (columns sorted by
name, rows in produced order).
"""
import sys, json, glob, math, datetime
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, int):
        return int(v)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    failures = []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            failures.append(name)
            continue
        try:
            got_cur = con.execute(
                "SELECT * FROM read_parquet(?)", [files])
            got_cols = [d[0] for d in got_cur.description]
            got = got_cur.fetchall()
            exp_cur = con.execute(sql)
            exp_cols = [d[0] for d in exp_cur.description]
            exp = exp_cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            failures.append(name)
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            n_fail += 1
            failures.append(name)
            continue
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        grows = [tuple(norm(r[i]) for i in gi) for r in got]
        erows = [tuple(norm(r[i]) for i in ei) for r in exp]
        if grows == erows:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            failures.append(name)
            if len(grows) != len(exp):
                print(f"FAIL {name}: rowcount spark={len(grows)} oracle={len(erows)}")
            else:
                for i, (g, e) in enumerate(zip(grows, erows)):
                    if g != e:
                        print(f"FAIL {name}: first diff at row {i} (cols {sorted(got_cols)}):\n  spark : {g}\n  oracle: {e}")
                        break
    print(f"== {n_pass} pass, {n_fail} fail" + (f": {' '.join(failures)}" if failures else ""))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
