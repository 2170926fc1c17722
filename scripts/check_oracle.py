#!/usr/bin/env python3
"""Dev-only pre-flight for the driver's DuckDB-oracle correctness gate.

Mirrors the driver: for each parquet dump written by `graft.Verify` into
OUT_DIR, run the matching SQL from oracle_sql.json in DuckDB against the
same sf tables, then compare schemas + values (columns sorted by name,
rows sorted). Not part of the Scala library — local tooling only.

TYPE-FAITHFUL since r15: values are fetched through ONE DuckDB
connection, so int64 vs int128 vs Decimal stringify identically and a
value-only canon is structurally blind to the exact class that caused
all four r12–r14 driver reds (3× DECIMAL, 1× HUGEINT — DuckDB's
sum(BIGINT) returns HUGEINT). Each comparison therefore also checks the
per-column RESULT TYPES (DuckDB relation types on both sides, mapped to
driver-equivalence classes): an oracle whose final projection is
HUGEINT/DECIMAL while the Spark dump is BIGINT now reds locally.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Driver-equivalence classes for result types. Widths INSIDE a class
# canonicalize identically on the driver (str() of an int32 == str()
# of the same int64); classes are split exactly where the driver is
# KNOWN to diverge: DECIMAL (r12/r13 reds q199/q204/q214) and HUGEINT
# (r13/r14 red q233) each get their own class and can never equal the
# integer class.
_TYPE_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int",
    "BIGINT": "int", "UTINYINT": "int", "USMALLINT": "int",
    "UINTEGER": "int", "UBIGINT": "int",
    "HUGEINT": "HUGEINT", "UHUGEINT": "HUGEINT",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "DATE": "date", "BOOLEAN": "bool",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
    "TIMESTAMP_NS": "ts", "TIMESTAMP_MS": "ts",
}


def type_class(t):
    """Map a DuckDB type (str or DuckDBPyType) to its driver class."""
    s = str(t)
    if s.startswith("DECIMAL"):
        return "DECIMAL"
    if s.endswith("[]"):  # list type
        return type_class(s[:-2]) + "[]"
    if s.startswith("STRUCT") or s.startswith("MAP"):
        # compare structs/maps textually but with inner decimals loud
        return "DECIMAL" if "DECIMAL" in s else s
    return _TYPE_CLASS.get(s, s)


def compare_types(got_cols, got_types, want_cols, want_types):
    """Return per-column type-class mismatches (col, spark, duck)."""
    g = {c: type_class(t) for c, t in zip(got_cols, got_types)}
    w = {c: type_class(t) for c, t in zip(want_cols, want_types)}
    return [(c, g[c], w[c]) for c in sorted(g) if c in w and g[c] != w[c]]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.6f}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)


def attach_views(con, sf_dir):
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")


def main(sf_dir, out_dir):
    con = duckdb.connect()
    attach_views(con, sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols, got_types = got.columns, got.types
            got_rows = got.fetchall()
            want = con.sql(sql)
            want_cols, want_types = want.columns, want.types
            want_rows = want.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} "
                  f"duck={sorted(want_cols)}")
            n_fail += 1
            continue
        tdiff = compare_types(got_cols, got_types, want_cols, want_types)
        if tdiff:
            print(f"FAIL {name}: result-TYPE divergence (driver-red "
                  f"class) spark-vs-duck: {tdiff}")
            n_fail += 1
            continue
        g, w = canon(got_rows, got_cols), canon(want_rows, want_cols)
        if g != w:
            n_fail += 1
            diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"FAIL {name}: rows spark={len(g)} duck={len(w)}; "
                  f"first diffs: {diff}")
            if len(g) != len(w):
                only_g = set(g) - set(w)
                only_w = set(w) - set(g)
                print(f"  only-spark: {list(only_g)[:2]}")
                print(f"  only-duck:  {list(only_w)[:2]}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(g)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
