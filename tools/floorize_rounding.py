#!/usr/bin/env python3
"""Per-query floor-form rounding conversion (r14 verdict task 3).

Extends the round-13 knife-edge policy to the whole corpus: any query
whose Spark/oracle pair rounds an unconstrained ratio (division, avg)
gets EVERY round( in BOTH its sides converted to the floor form
`floor((x) * 1e{d} + 0.5) / 1e{d}` — the same IEEE op sequence in
both engines, bit-equal by construction. Conversion unit is the QUERY
(not the site) so the two sides of a pair can never end up with
mixed rounding forms for the same cell: after this pass, a query
either uses floor-form everywhere or plain round() everywhere
(the latter only when all its rounded cells sit on a <=2-dp money
grid, >=5e-7 from any 6-dp half).

Closure rules beyond the per-site classifier:
  - query-file helpers with risky rounds taint every query whose
    entry text references them (fixpoint through helper->helper);
  - engine functions with ratio rounds (Dedup jaccard/containment,
    Knn/Srp cosine & z-stats, TextOps repetition, Decontam overlap,
    StatOps ksPerGroup) taint their query users the same way — the
    engine sites themselves are converted by hand in the same commit.

Driver-side tooling only — NOT part of the shipped library.
Usage: tools/floorize_rounding.py [--write]   (default: dry-run report)
"""
import glob
import re
import sys

POW10 = re.compile(r"/\s*1e[0-9]+\b|/\s*10+\.0\b|/\s*10+\b")
RISK = re.compile(r"/|\bavg\s*\(|\bmean\s*\(")
QKEY = re.compile(r'"(q\d+_\w+)"\s*->')
# engine functions whose F.round sites are converted by hand in this
# commit; any query (or helper) naming one of these is tainted
ENGINE_FNS = [
    "verifiedJaccard", "jaccardPairs", "jaccardPairsPrefix",
    "containmentPairsPrefix", "groupShingleOverlap", "minhashNearDups",
    "minhashNearDupsAgainst", "bruteForceKnn", "hardNegatives",
    "zNormalizeStats", "ivfKnn", "ivfKnnAuto", "exactKnnBnB",
    "embeddingNearDups", "cosineNearDups",
    "repetitionSignals", "overlapFraction", "ksPerGroup",
]


def balanced(text, start):
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    return None


def balanced_code(text, start):
    """Like balanced(), but parens inside Scala strings (incl. triple-
    quoted) and // comments don't count — needed to find the true
    extent of a Map literal whose entries embed SQL text."""
    depth = 0
    i = start
    n = len(text)
    while i < n:
        c = text[i]
        if text.startswith('"""', i):
            j = text.find('"""', i + 3)
            # Scala closes triple-quoted strings greedily: """" is
            # content `"` + closer, so extend while quotes follow
            while j != -1 and j + 3 < n and text[j + 3] == '"':
                j += 1
            i = (j + 3) if j != -1 else n
            continue
        if c == '"':
            j = i + 1
            while j < n and text[j] != '"':
                j += 2 if text[j] == "\\" else 1
            i = j + 1
            continue
        if text.startswith("//", i):
            j = text.find("\n", i)
            i = j if j != -1 else n
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return None


def split_args(arg):
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
        return arg, None
    return arg[:last], arg[last + 1:].strip()


def in_comment(text, off):
    bol = text.rfind("\n", 0, off) + 1
    prefix = text[bol:off]
    return "//" in prefix or prefix.lstrip().startswith("*")


def map_entries(text):
    """Yield (qname, start, end) for every entry of every Map literal
    that opens with a query key."""
    out = []
    for m in re.finditer(
            r'Map\((?:\s|//[^\n]*)*"q\d+_\w+"\s*->', text):
        open_paren = m.start() + 3
        close = balanced_code(text, open_paren)
        if close is None:
            continue
        marks = [(k.start(), k.group(1))
                 for k in QKEY.finditer(text, open_paren, close)]
        # drop markers nested inside an entry (string content never
        # matches the key pattern; nested maps would, but none exist)
        for i, (off, name) in enumerate(marks):
            end = marks[i + 1][0] if i + 1 < len(marks) else close
            out.append((name, off, end))
    return out


def helper_defs(text, entries):
    """(name, start, end) for top-level defs/vals outside map entries."""
    spans = [(s, e) for _, s, e in entries]
    defs = []
    for m in re.finditer(
            r"^  (?:private(?:\[\w+\])? )?(?:lazy )?(?:def|val) (\w+)",
            text, re.M):
        if any(s <= m.start() < e for s, e in spans):
            continue
        defs.append([m.group(1), m.start(), len(text)])
    for i in range(len(defs) - 1):
        defs[i][2] = defs[i + 1][1]
    # clip helper bodies at any map literal they'd otherwise swallow
    for d in defs:
        for s, e in spans:
            if d[1] < s < d[2]:
                d[2] = s
    return [tuple(d) for d in defs]


def rewrite_region(text, start, end):
    """Convert every non-comment round( call inside [start, end)."""
    n = 0
    out = text
    # right-to-left so offsets stay valid
    sites = [m for m in re.finditer(r"(F\.)?\bround\s*\(", out)
             if start <= m.start() < end and not in_comment(out, m.start())]
    for m in reversed(sites):
        op = out.find("(", m.end() - 1)
        close = balanced(out, op)
        if close is None:
            continue
        expr, d = split_args(out[op + 1:close])
        d = d if d is not None else "0"
        if not re.fullmatch(r"\d+", d):
            print(f"SKIP non-literal digits at offset {m.start()}: {d[:40]}")
            continue
        if m.group(1):  # Scala Column API
            rep = f"(F.floor(({expr.strip()}) * 1e{d} + 0.5) / 1e{d})"
        else:           # SQL text (Spark SQL or DuckDB — same form)
            rep = f"floor(({expr.strip()}) * 1e{d} + 0.5) / 1e{d}"
        out = out[:m.start()] + rep + out[close + 1:]
        n += 1
    return out, n


def main():
    write = "--write" in sys.argv
    files = sorted(glob.glob("src/main/scala/graft/queries/*.scala"))
    parsed = {}
    tainted = set()
    tainted_helpers = {}  # path -> set(helper names)
    for path in files:
        text = open(path).read()
        entries = map_entries(text)
        helpers = helper_defs(text, entries)
        parsed[path] = (text, entries, helpers)
        # invariant: every query-key occurrence must land inside a
        # parsed entry — a missed Map literal would silently exempt
        # its queries from conversion
        for k in QKEY.finditer(text):
            if in_comment(text, k.start()):
                continue
            if not any(s <= k.start() < e for _, s, e in entries):
                print(f"UNPARSED entry {k.group(1)} at {path}:"
                      f"{text[:k.start()].count(chr(10)) + 1}")
        risky_help = set()
        for m in re.finditer(r"\bround\s*\(", text):
            if in_comment(text, m.start()):
                continue
            op = text.find("(", m.end() - 1)
            close = balanced(text, op)
            if close is None:
                continue
            expr, _ = split_args(text[op + 1:close])
            flat = " ".join(expr.split())
            if not RISK.search(POW10.sub(" ", flat)):
                continue
            owner = next((n for n, s, e in entries if s <= m.start() < e),
                         None)
            if owner:
                tainted.add(owner)
            else:
                h = next((n for n, s, e in helpers if s <= m.start() < e),
                         None)
                if h:
                    risky_help.add(h)
                else:
                    print(f"ORPHAN risky site {path}:"
                          f"{text[:m.start()].count(chr(10)) + 1}")
        tainted_helpers[path] = risky_help

    # helper fixpoint: a helper calling a risky helper or engine fn is
    # itself risky; then taint every query whose entry references any
    # risky helper or engine fn
    for path, (text, entries, helpers) in parsed.items():
        risky = tainted_helpers[path]
        changed = True
        while changed:
            changed = False
            for n, s, e in helpers:
                if n in risky:
                    continue
                body = text[s:e]
                if any(re.search(r"\b" + f + r"\b", body)
                       for f in ENGINE_FNS + sorted(risky)):
                    risky.add(n)
                    changed = True
        for qname, s, e in entries:
            body = text[s:e]
            if any(re.search(r"\b" + f + r"\b", body)
                   for f in ENGINE_FNS + sorted(risky)):
                tainted.add(qname)

    print(f"tainted queries: {len(tainted)}")
    total = 0
    for path, (text, entries, helpers) in parsed.items():
        regions = [(s, e) for n, s, e in entries if n in tainted]
        regions += [(s, e) for n, s, e in helpers
                    if n in tainted_helpers[path]]
        n_file = 0
        # rewrite regions right-to-left so earlier offsets stay valid
        for s, e in sorted(regions, reverse=True):
            text, n = rewrite_region(text, s, e)
            n_file += n
        if n_file and write:
            open(path, "w").write(text)
        if n_file:
            print(f"{path}: {n_file} sites converted"
                  f"{'' if write else ' (dry-run)'}")
        total += n_file
    print(f"== total {total} sites, {len(tainted)} queries: "
          f"{' '.join(sorted(tainted))}")


if __name__ == "__main__":
    main()
