#!/usr/bin/env python3
"""Dev-only cross-run determinism harness (round-13, VERDICT item 2).

Compares two or more `graft.Verify` output dirs (ideally produced under
DIFFERENT parallelism via SPARK_GRAFT_CPUS) query by query: canonical
rows (columns sorted by name, float formatting at 6 dp — the driver's
compare convention) must be identical across every run. Any query whose
oracle replays a training trajectory is reduce-order-sensitive if this
ever differs; the round-12 drift-gate flake (q199/q204/q214) is the
class this makes visible on demand instead of once per driver roll.

Usage: python3 scripts/stability_check.py <outDir1> <outDir2> [...]
"""
import os
import sys

import duckdb


def canon(con, d, name):
    got = con.execute(f"SELECT * FROM '{d}/{name}/*.parquet'")
    cols = [c[0] for c in got.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in got.fetchall():
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.6f}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(cols), sorted(out)


def main(dirs):
    con = duckdb.connect()
    names = sorted(n for n in os.listdir(dirs[0])
                   if os.path.isdir(os.path.join(dirs[0], n)))
    n_stable = n_unstable = 0
    for name in names:
        try:
            ref = canon(con, dirs[0], name)
            bad = [d for d in dirs[1:] if canon(con, d, name) != ref]
        except Exception as e:  # noqa: BLE001
            print(f"ERROR  {name}: {e}")
            n_unstable += 1
            continue
        if bad:
            print(f"UNSTABLE {name}: differs in {bad}")
            n_unstable += 1
        else:
            n_stable += 1
    print(f"== {n_stable} stable, {n_unstable} unstable over "
          f"{len(dirs)} runs ==")
    return 1 if n_unstable else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
