#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: tools/check.py <sfDir> <outDir> [query ...]

Reads <outDir>/<name>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle in DuckDB against views over
<sfDir>/*.parquet, and compares: columns sorted by name, rows sorted,
floats normalized to 9 significant digits. Prints PASS/FAIL per query.

Driver-side tooling only — NOT part of the shipped library.
"""
import sys, os, json, glob, math

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    # Strict dtype-aware normalization: int 25 and float 25.0 must NOT
    # fold together — the driver converts DuckDB results through pandas,
    # where HUGEINT (integer window sums) and floor()/ceiling() become
    # float64 and hash as "25.0" against Spark's BIGINT "25". Round-1
    # q33/q71 hash failures were exactly this, invisible to the old
    # %.9g normalization.
    if v is None:
        return "NULL"
    if (hasattr(v, "tolist") and hasattr(v, "ndim") and v.ndim > 0) or \
            isinstance(v, (list, tuple)):
        # DRIVER PARITY: the driver's canonicalizer (pandas sort_values)
        # crashes on list cells ("unhashable type: numpy.ndarray") — it
        # cannot verify array-typed final columns. Round 6 shipped q245
        # with array<string> top_shared because this replica silently
        # normalized arrays elementwise and passed it. Final projections
        # must be scalar-only; fail loudly here so the local gate
        # catches it BEFORE the driver does.
        raise TypeError(
            "array-typed result cell — final projections must be "
            "scalar-only (stringify with concat_ws/array_to_string); "
            "the driver's pandas canonicalizer cannot sort list cells")
    if hasattr(v, "item"):  # numpy scalar → Python scalar
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0.0" if math.copysign(1, v) > 0 else "-0.0"
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"EMPTY  {name}: no parquet output")
            n_fail += 1
            continue
        # Go through pandas (.df()) like the driver does: DuckDB HUGEINT
        # and floor()/ceiling() land as float64 there, so dtype drift vs
        # Spark's BIGINT is visible. fetchall() would hide it (Python int).
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        g_df = got.df()
        g_cols = list(g_df.columns)
        g_rows = [tuple(r) for r in g_df.itertuples(index=False, name=None)]
        if name not in oracles:
            print(f"NOORA  {name}: rows={len(g_rows)} (rows-only check: "
                  f"{'PASS' if len(g_rows) > 0 else 'FAIL'})")
            if len(g_rows) > 0:
                n_pass += 1
            else:
                n_fail += 1
            continue
        try:
            exp = con.execute(oracles[name])
            e_df = exp.df()
            e_cols = list(e_df.columns)
            e_rows = [tuple(r)
                      for r in e_df.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"ORAERR {name}: {e}")
            n_fail += 1
            continue
        gc, gr = canon(g_rows, g_cols)
        ec, er = canon(e_rows, e_cols)
        # dtype drift warning (driver may or may not be type-strict)
        g_t = dict(zip(g_cols, [d[1] for d in got.description]))
        e_t = dict(zip(e_cols, [d[1] for d in exp.description]))
        for c in set(g_t) & set(e_t):
            if g_t[c] != e_t[c]:
                print(f"  [dtype] {name}.{c}: spark={g_t[c]} "
                      f"oracle={e_t[c]}")
        if gc != ec:
            print(f"SCHEMA {name}: spark={gc} oracle={ec}")
            n_fail += 1
            continue
        if gr != er:
            print(f"HASH   {name}: rows spark={len(gr)} oracle={len(er)}")
            diff = [(a, b) for a, b in zip(gr, er) if a != b]
            for a, b in diff[:3]:
                print(f"    spark:  {a}\n    oracle: {b}")
            extra_g = len(gr) - len(er)
            if extra_g:
                print(f"    row-count delta: {extra_g}")
            n_fail += 1
            continue
        print(f"PASS   {name}: rows={len(gr)}")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
