#!/usr/bin/env python3
"""Compare two graft.Verify output directories query-by-query.

Usage: tools/compare_dumps.py <outDirA> <outDirB>

Canonicalizes both sides exactly like tools/check.py (columns sorted by
name, rows sorted, dtype-aware cell normalization) and reports any query
whose canonical row set differs. Unlike check.py this needs no oracle,
so it also covers the NOORA queries — the partition-invariance sweep
runs Verify twice at different SPARK_GRAFT_CPUS (= shuffle-partition
counts) and requires every one of the dumps to be identical.

Driver-side tooling only — NOT part of the shipped library.
"""
import sys, os, glob

import duckdb

from check import canon


def load(con, out_dir, name):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return None, None
    rel = con.execute(
        f"SELECT * FROM read_parquet({files!r})")
    rows = rel.fetchall()
    cols = [d[0] for d in rel.description]
    return canon(rows, cols)


def main():
    dir_a, dir_b = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    names_a = sorted(d for d in os.listdir(dir_a)
                     if os.path.isdir(os.path.join(dir_a, d)))
    names_b = {d for d in os.listdir(dir_b)
               if os.path.isdir(os.path.join(dir_b, d))}
    n_pass = n_fail = 0
    for name in names_a:
        if name not in names_b:
            print(f"MISS   {name}: absent from {dir_b}")
            n_fail += 1
            continue
        ca, ra = load(con, dir_a, name)
        cb, rb = load(con, dir_b, name)
        if ca is None or cb is None:
            print(f"EMPTY  {name}")
            n_fail += 1
        elif ca != cb:
            print(f"SCHEMA {name}: {ca} vs {cb}")
            n_fail += 1
        elif ra != rb:
            # find the first differing row for the report
            diff = next((i for i, (x, y) in enumerate(zip(ra, rb))
                         if x != y), min(len(ra), len(rb)))
            print(f"ROWS   {name}: {len(ra)} vs {len(rb)} rows; "
                  f"first diff at sorted row {diff}")
            n_fail += 1
        else:
            print(f"PASS   {name}: rows={len(ra)}")
            n_pass += 1
    # Symmetric MISS check: a dump present only on the B side (extra or
    # renamed query dir) must fail too, not pass silently.
    for name in sorted(names_b - set(names_a)):
        print(f"MISS   {name}: absent from {dir_a}")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
