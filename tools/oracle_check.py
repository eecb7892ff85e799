#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query dumped
by graft.Verify, run its oracle SQL in DuckDB over the same sf parquet
tables and compare (row count, sorted-by-column-name value comparison).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    # Deliberately STRICT (mirrors the driver's hasher): decimals are kept
    # as Decimal with their scale, floats compared exactly. Queries must
    # canonicalize output types themselves (cast decimal sums to double,
    # serialize arrays) or they fail here like they fail the driver.
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    import decimal
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # a partial Verify dump (local iteration with a query filter) only
    # checks the queries it dumped; the driver's full dump checks all
    import os
    dumped = {n for n in oracle if os.path.isdir(f"{out_dir}/{n}")}
    if dumped != set(oracle):
        print(f"[partial dump: checking {len(dumped)}/{len(oracle)} queries]")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name not in dumped:
            continue
        try:
            got_tbl = pq.read_table(f"{out_dir}/{name}")
            got_cols = got_tbl.column_names
            got_rows = [tuple(r.values()) for r in got_tbl.to_pylist()]
            res = con.execute(sql)
            exp_cols = [d[0] for d in res.description]
            exp_rows = res.fetchall()
            gc, gr = norm_rows(got_cols, got_rows)
            ec, er = norm_rows(exp_cols, exp_rows)
            if gc != ec:
                print(f"FAIL {name}: schema {gc} != {ec}")
                n_fail += 1
            elif len(gr) != len(er):
                print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
                n_fail += 1
            elif gr != er:
                bad = [(a, b) for a, b in zip(gr, er) if a != b][:3]
                print(f"FAIL {name}: values differ, e.g. {bad}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(gr)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
