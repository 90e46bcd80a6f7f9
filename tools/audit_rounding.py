#!/usr/bin/env python3
"""Knife-edge rounding-policy audit over the query corpus (r14 task 3).

Round 13's sf0.1 oracle sweep proved that `round(x, d)` of an
unconstrained ratio diverges Spark-vs-DuckDB when x's shortest decimal
representation lands on an exact d-dp half (Spark HALF_UPs the decimal
repr; DuckDB rounds the binary value). Five queries were converted to
the floor form `floor(x*10^d + 0.5)/10^d` — the same IEEE op sequence
in both engines. The sweep only proves absence of knife edges at the
TESTED scales; this script finds the latent sites: every round( call
(Scala `F.round(...)` or SQL text inside basedOn/oracle strings) whose
argument contains a division or mean — i.e. a value NOT confined to a
≤2-dp money grid, where an exact d-dp half is reachable.

Safe-by-construction (not flagged):
  - round of a bare money column / sum / difference: a 2-dp-grid value
    is >=5e-7 from any 6-dp half, far above accumulated fp error;
  - divisions by power-of-10 literals of integer-grid operands (cents
    /100 etc.): still a decimal-grid value, same argument;
  - already-converted floor-form sites.

Driver-side tooling only — NOT part of the shipped library.
Usage: tools/audit_rounding.py [--all]   (--all lists safe sites too)
"""
import glob
import re
import sys

# divisions by a power-of-10 literal keep decimal-grid operands on a
# decimal grid — not a knife-edge source by themselves
POW10 = re.compile(r"/\s*1e[0-9]+\b|/\s*10+\.0\b|/\s*10+\b|/\s*100\.0\b")
RISK = re.compile(r"/|\bavg\s*\(|\bmean\s*\(")


def balanced(text, start):
    """Return the argument substring for the '(' at text[start]."""
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return text[start + 1:i]
    return None


def split_top(arg):
    """Split 'expr, digits' at the top-level comma (last one)."""
    depth = 0
    last = None
    for i, c in enumerate(arg):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            last = i
    if last is None:
        return arg, "0"
    return arg[:last], arg[last + 1:].strip()


def main():
    show_all = "--all" in sys.argv
    n_risky = n_safe = 0
    for path in sorted(glob.glob("src/main/scala/graft/queries/*.scala")):
        text = open(path).read()
        # strip line comments so commented-out examples don't count
        stripped = re.sub(r"//[^\n]*", "", text)
        for m in re.finditer(r"\bround\s*\(", stripped):
            # comment-stripping preserves newlines, so line numbers in
            # `stripped` match the original file
            line = stripped[:m.start()].count("\n") + 1
            arg = balanced(stripped, m.end() - 1)
            if arg is None:
                continue
            expr, digits = split_top(arg)
            flat = " ".join(expr.split())
            risky = bool(RISK.search(POW10.sub(" ", flat)))
            if risky:
                n_risky += 1
                print(f"RISKY {path}:{line} d={digits} :: {flat[:110]}")
            else:
                n_safe += 1
                if show_all:
                    print(f"safe  {path}:{line} d={digits} :: {flat[:80]}")
    print(f"== {n_risky} risky, {n_safe} safe")


if __name__ == "__main__":
    main()
