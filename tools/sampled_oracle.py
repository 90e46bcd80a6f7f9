#!/usr/bin/env python3
"""Sampled (hash-carved) oracle mode for the quadratic dedup/CC
oracles (r14 verdict task 4).

The sf0.1 sweep leaves a handful of dedup/CC rows validated only at
sf0.01 because their ground-truth DuckDB oracles are quadratic BY
DESIGN (all-pairs list_intersect Jaccard, recursive-CTE components) —
at 5000 docs the ORACLE, not the engine, exceeds the 600 s budget. A
deterministic id carve (id % MOD == 0) shrinks the oracle's pair space
by MOD² while keeping ~10× the sf0.01 row volume, closing those rows
at sf0.1 within budget. Two soundness regimes:

  RESTRICTED-DUMP (q41 pair queries): the committed full-corpus engine
  dump, filtered to pairs with BOTH endpoints in the carve, must equal
  the quadratic oracle run over the carved documents view. Sound
  because jaccard(a, b) depends only on the two documents' own shingle
  sets, and the engine's banded candidate generation is complete — a
  qualifying carve-internal pair missing from the full dump is a real
  recall bug, and an extra one is a real precision bug.

  CARVE-RERUN (q102 components, q90 curation, q242 MMR): cluster
  labels / dedup survivorship / greedy selection are NOT restriction-
  closed (a carved doc's duplicate twin may sit outside the carve), so
  both sides run on the carved INPUT: graft.Verify against a carve
  directory, tools/check.py against the same directory. This validates
  the operator at carve scale (~3.3x the sf0.01 gate volume) with the
  standard harness — see SCALE.md round-14 notes for the recipe.

Usage:
  tools/sampled_oracle.py carve <sfDir> <carveDir> [mod=3]
  tools/sampled_oracle.py q41 <sfDir> <outDir> [mod=3]
  tools/sampled_oracle.py pairs <query> <sfDir> <outDir> [mod=3]
    (any (id1, id2)-keyed dump whose cells are pair-local — q41,
     q157_prefix_jaccard, q159_minhash_estimate, q245_neardup_explain)

Driver-side tooling only — NOT part of the shipped library.
"""
import json
import sys

import duckdb

from check import canon


def carve(sf_dir, carve_dir, mod):
    con = duckdb.connect()
    import os
    os.makedirs(carve_dir, exist_ok=True)
    for t, key in [("documents", "doc_id"), ("embeddings", "vec_id")]:
        con.execute(
            f"COPY (SELECT * FROM '{sf_dir}/{t}.parquet' "
            f"WHERE {key} % {mod} = 0) "
            f"TO '{carve_dir}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{carve_dir}/{t}.parquet'"
        ).fetchone()[0]
        print(f"carved {t}: {n} rows (mod {mod})")


def pairs_restricted(query, sf_dir, out_dir, mod):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet' WHERE doc_id % {mod} = 0")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))[query]
    exp = con.execute(oracle)
    e_rows, e_cols = exp.fetchall(), [d[0] for d in exp.description]
    got = con.execute(
        f"SELECT * FROM read_parquet('{out_dir}/{query}/*.parquet') "
        f"WHERE id1 % {mod} = 0 AND id2 % {mod} = 0")
    g_rows, g_cols = got.fetchall(), [d[0] for d in got.description]
    gc, gr = canon(g_rows, g_cols)
    ec, er = canon(e_rows, e_cols)
    if gc != ec:
        print(f"SCHEMA {query}_restricted: {gc} vs {ec}")
        sys.exit(1)
    if gr != er:
        only_e = set(er) - set(gr)
        only_g = set(gr) - set(er)
        print(f"ROWS {query}_restricted: engine {len(gr)} vs oracle "
              f"{len(er)}; oracle-only {sorted(only_e)[:5]} "
              f"engine-only {sorted(only_g)[:5]}")
        sys.exit(1)
    print(f"PASS {query}_restricted: {len(gr)} carve-internal pairs "
          f"bit-match the quadratic oracle (mod {mod})")


def main():
    cmd = sys.argv[1]
    if cmd == "carve":
        mod = int(sys.argv[4]) if len(sys.argv) > 4 else 3
        carve(sys.argv[2], sys.argv[3], mod)
    elif cmd == "q41":
        mod = int(sys.argv[4]) if len(sys.argv) > 4 else 3
        pairs_restricted("q41_minhash_neardup", sys.argv[2],
                         sys.argv[3], mod)
    elif cmd == "pairs":
        mod = int(sys.argv[5]) if len(sys.argv) > 5 else 3
        pairs_restricted(sys.argv[2], sys.argv[3], sys.argv[4], mod)
    else:
        sys.exit(f"unknown command {cmd}")


if __name__ == "__main__":
    main()
