#!/usr/bin/env python3
"""Dev-only pre-flight for the driver's DuckDB-oracle correctness gate.

Mirrors the driver: for each parquet dump written by `graft.Verify` into
OUT_DIR, run the matching SQL from oracle_sql.json in DuckDB against the
same sf tables, then compare schemas + values (columns sorted by name,
rows sorted). Not part of the Scala library — local tooling only.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


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


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
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
