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

def canon_duck_type(t):
    """Canonical type class for a DuckDB result column type (str of
    DuckDBPyType). The driver's hasher is type-sensitive: DuckDB HUGEINT
    (sum over BIGINT widens) hashes differently from Spark BIGINT even
    when values are equal — this is how t34 stayed red for two rounds
    while the value-only comparison below said PASS."""
    s = str(t).upper()
    if s.startswith("DECIMAL"):
        return "decimal"
    if s.startswith("STRUCT"):
        return "struct"
    if s.endswith("[]") or s.startswith("LIST"):
        return "list"
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    return {
        # signed ints <=64-bit collapse to one class: the driver's hasher
        # is empirically width-insensitive (q11/q14/s02 int32-vs-int64 were
        # driver-green for rounds) but HUGEINT/DECIMAL-vs-BIGINT fails it.
        "BIGINT": "int", "HUGEINT": "hugeint", "INTEGER": "int",
        "SMALLINT": "int", "TINYINT": "int", "UBIGINT": "uint64",
        "DOUBLE": "double", "FLOAT": "float", "REAL": "float",
        "VARCHAR": "string", "BOOLEAN": "bool", "DATE": "date",
        "BLOB": "binary",
    }.get(s, s.lower())

def canon_arrow_type(t):
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_signed_integer(t):
        return "int"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return str(t)

def type_drift(got_tbl, res_types, got_cols, exp_cols):
    """Return list of (col, spark_type, oracle_type) canonical mismatches,
    matching columns by name (the driver sorts by column name too)."""
    exp_by_name = dict(zip(exp_cols, [canon_duck_type(t) for t in res_types]))
    bad = []
    for i, c in enumerate(got_cols):
        if c not in exp_by_name:
            continue  # schema mismatch reported separately
        gt = canon_arrow_type(got_tbl.schema.field(i).type)
        et = exp_by_name[c]
        if gt != et:
            bad.append((c, gt, et))
    return bad

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
            rel = con.sql(sql)
            exp_cols = list(rel.columns)
            exp_types = list(rel.types)
            exp_rows = rel.fetchall()
            gc, gr = norm_rows(got_cols, got_rows)
            ec, er = norm_rows(exp_cols, exp_rows)
            drift = type_drift(got_tbl, exp_types, got_cols, exp_cols)
            if drift:
                print(f"FAIL {name}: type drift (spark vs oracle): {drift}")
                n_fail += 1
            elif gc != ec:
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
