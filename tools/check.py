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


def digest_sql(con, sql):
    """DuckDB side of the digest oracle (round 14): COUNT + two 32-bit
    row-hash sums over the canonical rendering DigestVerify.scala uses —
    sorted column names, each cast to VARCHAR with NULL rendered as the
    NUL sentinel (concat_ws SKIPS null args in both engines, which would
    make ("a",NULL,"b") hash equal to ("a","b",NULL)), concat_ws('|'),
    md5, the first/second 8 hex chars as unsigned ints. Only
    integer/string columns render identically across engines; refuse
    anything else — and refuse string values embedding the '|' delimiter
    or the sentinel (ambiguous rendering), counted in the same pass."""
    ok_types = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "VARCHAR",
                "HUGEINT", "UBIGINT", "UINTEGER"}
    desc = con.execute(f"DESCRIBE SELECT * FROM ({sql}) t").fetchall()
    for col_name, col_type, *_ in desc:
        if col_type not in ok_types:
            sys.exit(f"--digest: column {col_name} is {col_type}; the "
                     "digest only renders integer/string columns")
    cols = ", ".join(f'COALESCE(CAST("{c}" AS VARCHAR), chr(0))'
                     for c, *_ in sorted(desc, key=lambda d: d[0]))
    str_cols = [c for c, t, *_ in desc if t == "VARCHAR"]
    bad = " + ".join(
        f"CASE WHEN contains(\"{c}\", '|') OR contains(\"{c}\", chr(0)) "
        f"THEN 1 ELSE 0 END" for c in str_cols) or "0"
    h = f"md5(concat_ws('|', {cols}))"
    q = (f"SELECT count(*) AS cnt, "
         f"sum(('0x' || substr({h},1,8))::BIGINT) AS h1, "
         f"sum(('0x' || substr({h},9,8))::BIGINT) AS h2, "
         f"sum({bad}) AS bad "
         f"FROM ({sql}) t")
    cnt, h1, h2, bad_n = con.execute(q).fetchone()
    if bad_n and int(bad_n) > 0:
        sys.exit(f"--digest: {bad_n} string value(s) embed the '|' "
                 "delimiter or the NUL sentinel — the canonical rendering "
                 "is ambiguous; use the full row compare for this key")
    return int(cnt), int(h1 or 0), int(h2 or 0)


# Float-boundary set compare (round 14): the two embedding-cosine keys
# are exact w.r.t. a DECIMAL(18,6)-rounded score, but at sf1 pair volume
# (~1e8) the engines' float32 summation orders differ by ~1e-7 — enough
# to round a value sitting essentially ON a 1e-6 cell edge into adjacent
# cells, legitimately swapping ranks / threshold membership.  The
# tolerant compare accepts ONLY that: membership may differ solely where
# the recomputed scores of the disagreeing rows sit within one decimal
# cell (2e-6) of each other (top-k swap) or of the threshold (dedup).
TOPK_BOUNDARY = 2e-6


def cos_of(con, pairs):
    """Recompute cosine in DuckDB for (a_vec_id, b_vec_id) pairs."""
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    q = (f"SELECT v.c1, v.c2, list_cosine_similarity(a.embedding, b.embedding) "
         f"FROM (VALUES {vals}) v(c1, c2) "
         f"JOIN embeddings a ON a.vec_id = v.c1 "
         f"JOIN embeddings b ON b.vec_id = v.c2")
    return {(r[0], r[1]): r[2] for r in con.execute(q).fetchall()}


def setcmp_topk(con, got_df, exp_df):
    """Per-qid neighbor compare for sim_topk_cosine. Membership may
    differ only where the disagreeing neighbors' recomputed cosines sit
    within one decimal cell of each other, and — round-14 ADVICE — rank
    disagreements among SHARED neighbors get the mirrored check: every
    shared neighbor whose rank differs must sit within one decimal cell
    of the others it reordered against (a genuine rank-ordering
    regression among non-tied neighbors fails; a float-boundary tie
    swap passes). Returns (ok, message)."""
    def by_qid(df):
        out = {}
        for qid, nid, rank in zip(df["qid"], df["nid"], df["rank"]):
            out.setdefault(int(qid), {})[int(nid)] = int(rank)
        return out
    g, e = by_qid(got_df), by_qid(exp_df)
    if set(g) != set(e):
        return False, f"qid sets differ: {sorted(set(g) ^ set(e))[:5]}"
    swapped = reordered = 0
    for qid in g:
        gm, em = g[qid], e[qid]
        if gm == em:
            continue
        extra, missing = set(gm) - set(em), set(em) - set(gm)
        if len(extra) != len(missing):
            return False, f"qid {qid}: sizes differ ({len(gm)} vs {len(em)})"
        if extra:
            cos = cos_of(con, [(qid, n) for n in (extra | missing)])
            scores = [cos[(qid, n)] for n in (extra | missing)]
            if max(scores) - min(scores) > TOPK_BOUNDARY:
                return False, (f"qid {qid}: swap spans {max(scores) - min(scores):.2e}"
                               f" > one decimal cell (extra={extra} missing={missing})")
            swapped += len(extra)
        # compare shared neighbors by their RANK-COMPRESSED positions
        # (each side's order restricted to the shared set), not raw
        # ranks: a membership swap at rank r displaces every shared
        # neighbor below it by one raw rank, and those unit shifts used
        # to chain the intervals below into ONE cluster spanning many
        # score levels — a legitimate tie swap then failed the
        # one-cell bound (round-15 ADVICE: false failure, not a false
        # pass). Compression cancels insertion/deletion displacement
        # exactly; genuine mutual reorders still differ.
        shared = set(gm) & set(em)
        gorder = {n: i for i, n in enumerate(sorted(shared, key=lambda n: gm[n]))}
        eorder = {n: i for i, n in enumerate(sorted(shared, key=lambda n: em[n]))}
        shared_diff = {n for n in shared if gorder[n] != eorder[n]}
        if shared_diff:
            # cluster MUTUALLY-reordered neighbors before bounding: two
            # independent boundary ties at different score levels (say a
            # 2<->3 swap near cos 0.9 and a 7<->8 swap near 0.5) are each
            # legitimate, but a single max-min span over their union
            # would falsely fail. Neighbors reordered against each other
            # have overlapping [min(pos_got, pos_exp), max(...)]
            # intervals; merge overlapping intervals into clusters and
            # bound each cluster's recomputed-cosine span independently.
            cos = cos_of(con, [(qid, n) for n in shared_diff])
            ivs = sorted((min(gorder[n], eorder[n]), max(gorder[n], eorder[n]), n)
                         for n in shared_diff)
            clusters, cur, cur_hi = [], [ivs[0][2]], ivs[0][1]
            for lo_r, hi_r, n in ivs[1:]:
                if lo_r <= cur_hi:
                    cur.append(n)
                    cur_hi = max(cur_hi, hi_r)
                else:
                    clusters.append(cur)
                    cur, cur_hi = [n], hi_r
            clusters.append(cur)
            for cl in clusters:
                scores = [cos[(qid, n)] for n in cl]
                if max(scores) - min(scores) > TOPK_BOUNDARY:
                    return False, (f"qid {qid}: rank reorder spans "
                                   f"{max(scores) - min(scores):.2e} > one "
                                   f"decimal cell (nids={sorted(cl)})")
            reordered += len(shared_diff)
    return True, (f"{swapped} boundary membership swaps, "
                  f"{reordered} boundary rank reorders tolerated")


def setcmp_threshold(con, got_df, exp_df, thresh=0.5):
    """Pair-set compare for dedup_near_embedding: membership may differ
    only for pairs whose recomputed cosine is within one decimal cell of
    the threshold."""
    g = set(zip((int(x) for x in got_df["d1"]), (int(x) for x in got_df["d2"])))
    e = set(zip((int(x) for x in exp_df["d1"]), (int(x) for x in exp_df["d2"])))
    diff = g ^ e
    if not diff:
        return True, "exact pair-set match"
    cos = cos_of(con, sorted(diff))
    for p in sorted(diff):
        if abs(cos[p] - thresh) > TOPK_BOUNDARY:
            return False, (f"pair {p} (cos={cos[p]:.8f}) differs by more "
                           f"than one decimal cell from the {thresh} threshold")
    return True, f"{len(diff)} threshold-boundary pairs tolerated"


SETCMP = {"sim_topk_cosine": setcmp_topk,
          "dedup_near_embedding": setcmp_threshold}


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args) or args[i + 1].startswith("--"):
            sys.exit("usage: --json <path> needs a value")
        json_out = args[i + 1]
        del args[i:i + 2]
    # --digest <digests.json>: keys present in the file are compared in
    # digest form (COUNT + in-engine row-hash sums; see DigestVerify) —
    # the sf1 answer for result-explosion keys whose output cannot be
    # materialized.  --tolerant: the two embedding-cosine keys compare
    # as sets with a one-decimal-cell boundary tolerance (sf1 only; the
    # driver's sf0.01 gate stays exact).
    digests = {}
    if "--digest" in args:
        i = args.index("--digest")
        digests = json.load(open(args[i + 1]))
        del args[i:i + 2]
    tolerant = "--tolerant" in args
    if tolerant:
        args.remove("--tolerant")
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
        if name in digests:
            want = digests[name]
            try:
                cnt, h1, h2 = digest_sql(con, sql)
            except SystemExit:
                raise
            except Exception as e:
                print(f"FAIL {name}: digest: {type(e).__name__}: {e}")
                n_fail += 1
                failures.append(name)
                results[name] = {"pass": False, "err": f"digest: {e}"}
                continue
            got = (int(want["cnt"]), int(want["h1"]), int(want["h2"]))
            if got == (cnt, h1, h2):
                print(f"PASS {name} (digest: {cnt} rows, h1/h2 match)")
                n_pass += 1
                results[name] = {"pass": True, "rows": cnt, "mode": "digest"}
            else:
                print(f"FAIL {name}: digest spark={got} oracle={(cnt, h1, h2)}")
                n_fail += 1
                failures.append(name)
                results[name] = {"pass": False, "err": "digest mismatch",
                                 "spark": got, "oracle": [cnt, h1, h2]}
            continue
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
        if tolerant and name in SETCMP:
            try:
                ok, msg = SETCMP[name](con, got_df, exp_df)
            except Exception as e:
                ok, msg = False, f"{type(e).__name__}: {e}"
            if ok:
                print(f"PASS {name} ({len(got_df)} rows, set-compare: {msg})")
                n_pass += 1
                results[name] = {"pass": True, "rows": len(got_df),
                                 "mode": f"setcmp: {msg}"}
            else:
                print(f"FAIL {name}: set-compare: {msg}")
                n_fail += 1
                failures.append(name)
                results[name] = {"pass": False, "err": f"setcmp: {msg}"}
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
