#!/usr/bin/env python3
"""Driver-contract outlier census (round-14 ask #4).

The r12-r13 chronic driver reds were findable by census: exactly 3 of
253 queries emitted a DECIMAL(38,0) column, and those 3 were the reds.
This tool sweeps a `graft.Verify` dump dir and reports:

  1. output-schema type census — every arrow type used, with the
     queries using it; types used by <= FLAG_MAX queries are flagged
     as single-query outliers (the decimal class);
  2. oracle-SQL construct census — DuckDB functions whose NATIVE
     float implementation is version-dependent (list_cosine_similarity
     et al.), per query, so any discrete gate ranking on them can be
     migrated to the integer-rank-key convention.

  3. (r15, with an sfDir argument) ORACLE-side result-type census —
     the instrument the r12-r14 reds proved necessary: plan every
     oracle SQL in DuckDB (no execution) and FAIL (rc 1) on any final
     projection type outside the driver-safe set. All four driver
     reds of r12-r14 lived on the ORACLE side's DuckDB result types
     (3x DECIMAL, 1x HUGEINT from an un-cast sum(BIGINT)), where the
     Spark-dump schema census in (1) is structurally blind.

Usage: python3 scripts/type_census.py <verifyOutDir> [sfDir]
Dev tooling only — not part of the Scala library.
"""
import json
import os
import re
import sys
from collections import defaultdict

import pyarrow.parquet as pq

FLAG_MAX = 3
# DuckDB natives whose float kernels have changed across versions —
# a discrete decision (rank, threshold, membership) built on one is a
# latent cross-engine red; pure display/aggregate use is lower risk.
RISKY_FNS = [
    "list_cosine_similarity", "list_dot_product", "list_inner_product",
    "list_distance", "list_negative_inner_product",
]


def base_type(t):
    s = str(t)
    s = re.sub(r"<.*", "", s)
    return s


def walk(t, out):
    import pyarrow as pa
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        out.add("list")
        walk(t.value_type, out)
    elif pa.types.is_struct(t):
        out.add("struct")
        for f in t:
            walk(f.type, out)
    elif pa.types.is_map(t):
        out.add("map")
        walk(t.key_type, out)
        walk(t.item_type, out)
    else:
        out.add(base_type(t))


# Driver-safe DuckDB result types: everything the 266-query surface
# legitimately emits. HUGEINT, DECIMAL, BOOLEAN (or anything else) in
# a final projection is a FUTURE DRIVER RED — the driver's result hash
# canonicalizes those differently from the local one-connection canon.
SAFE_DUCK_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                   "FLOAT", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP",
                   "TIMESTAMP WITH TIME ZONE"}


def duck_type_ok(t):
    s = str(t)
    while s.endswith("[]"):
        s = s[:-2]
    if s.startswith("STRUCT") or s.startswith("MAP"):
        # structs/maps: every inner word must be safe-ish; the cheap
        # sufficient check is "no dangerous token inside"
        return not any(bad in s for bad in
                       ("DECIMAL", "HUGEINT", "BOOLEAN"))
    return s in SAFE_DUCK_TYPES


def oracle_type_census(out_dir, sf_dir):
    """Plan every oracle SQL in DuckDB; fail on unsafe result types."""
    import duckdb
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    print("\n== ORACLE-side result-type census (DuckDB plan types) ==")
    bad = []
    by_type = defaultdict(set)
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)  # plans only; nothing executes
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"PLAN ERROR: {e}"))
            continue
        for c, t in zip(rel.columns, rel.types):
            by_type[str(t)].add(name)
            if not duck_type_ok(t):
                bad.append((name, f"{c}: {t}"))
    for t, qs in sorted(by_type.items(), key=lambda kv: len(kv[1])):
        print(f"{t:30s} {len(qs):4d} oracles")
    if bad:
        print("\nUNSAFE ORACLE RESULT TYPES (future driver reds):")
        for name, what in bad:
            print(f"  {name}: {what}")
    else:
        print("zero unsafe oracle result types (contract holds)")
    return 1 if bad else 0


def main(out_dir):
    by_type = defaultdict(set)
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        schema = pq.read_schema(
            next(os.path.join(d, f) for f in os.listdir(d)
                 if f.endswith(".parquet")))
        for field in schema:
            types = set()
            walk(field.type, types)
            for t in types:
                by_type[t].add(name)

    print("== output-schema type census ==")
    outliers = []
    for t, qs in sorted(by_type.items(), key=lambda kv: len(kv[1])):
        flag = "  <-- OUTLIER" if len(qs) <= FLAG_MAX else ""
        print(f"{t:20s} {len(qs):4d} queries{flag}")
        if flag:
            outliers.append((t, sorted(qs)))
    for t, qs in outliers:
        print(f"  outlier {t}: {', '.join(qs)}")

    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    print("\n== risky DuckDB native float fns in oracle SQL ==")
    for fn in RISKY_FNS:
        users = sorted(q for q, sql in oracle.items() if fn in sql)
        if users:
            print(f"{fn}: {len(users)} queries")
            # the dangerous subset: the fn feeds a rank/threshold
            risky = [q for q in users
                     if re.search(fn + r"[^\n]*\)\s*(DESC|ASC|>=|<=|>|<)",
                                  oracle[q]) or
                     re.search(r"ORDER BY[^\n]*" + fn, oracle[q])]
            if risky:
                print(f"  feeding rank/threshold: {', '.join(risky)}")

    decimals = sorted(by_type.get("decimal128", set()) |
                      by_type.get("decimal256", set()))
    print(f"\ndecimal-output queries: {decimals or 'NONE (contract holds)'}")
    return 0


if __name__ == "__main__":
    rc = main(sys.argv[1])
    if len(sys.argv) > 2:
        rc = rc or oracle_type_census(sys.argv[1], sys.argv[2])
    sys.exit(rc)
