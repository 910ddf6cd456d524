#!/usr/bin/env python3
"""Collate sf1 gate logs into the PLANS.md markdown table.

Usage: python3 tools/gate_table.py LOG [LOG...] > table.md

Parses verify_local.py output lines:
  [ ok ] name: N rows (oracle T s)
  [rows] name: N rows (no oracle — rows-only)
  [FAIL] name: ...
  [SLOW] name: ...
Later logs win UNIFORMLY (r15 ADVICE: FAIL/SLOW also overwrite an
earlier ok, so a regression in a rerun log can't be silently masked);
a key whose status flips between logs gets a warning comment.
"""
import re
import sys

rows = {}
flipped = {}


def parse(line):
    m = re.match(r"\[ ok \] (\w+): (\d+) rows \(oracle ([0-9.]+)s\)", line)
    if m:
        return m.group(1), ("ok", m.group(2), m.group(3))
    m = re.match(r"\[rows\] (\w+): (\d+) rows", line)
    if m:
        return m.group(1), ("rows-only", m.group(2), "-")
    m = re.match(r"\[(FAIL|SLOW)\] (\w+):", line)
    if m:
        return m.group(2), (m.group(1), "-", "-")
    return None


for path in sys.argv[1:]:
    for line in open(path):
        hit = parse(line)
        if hit is None:
            continue
        key, new = hit
        if key in rows and rows[key][0] != new[0]:
            flipped[key] = (rows[key][0], new[0])
        rows[key] = new

n_ok = sum(1 for v in rows.values() if v[0] in ("ok", "rows-only"))
n_bad = len(rows) - n_ok
print(f"<!-- {len(rows)} rows: {n_ok} ok, {n_bad} fail/slow -->")
for k in sorted(flipped):
    a, b = flipped[k]
    print(f"<!-- WARNING: {k} status flipped across logs: {a} -> {b} "
          f"(last log wins) -->")
print("| query | sf1 hash | rows | oracle s |")
print("|---|---|---|---|")
for k in sorted(rows):
    st, n, t = rows[k]
    print(f"| {k} | {st} | {n} | {t} |")
