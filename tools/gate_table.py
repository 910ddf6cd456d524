#!/usr/bin/env python3
"""Collate sf1 gate logs into the PLANS.md markdown table.

Usage: python3 tools/gate_table.py LOG [LOG...] > table.md

Parses verify_local.py output lines:
  [ ok ] name: N rows (oracle T s)
  [rows] name: N rows (no oracle — rows-only)
  [FAIL] name: ...
  [SLOW] name: ...
Later logs win (a dedicated-pass rerun of a SLOW row replaces it).
"""
import re
import sys

rows = {}
for path in sys.argv[1:]:
    for line in open(path):
        m = re.match(r"\[ ok \] (\w+): (\d+) rows \(oracle ([0-9.]+)s\)", line)
        if m:
            rows[m.group(1)] = ("ok", m.group(2), m.group(3))
            continue
        m = re.match(r"\[rows\] (\w+): (\d+) rows", line)
        if m:
            rows[m.group(1)] = ("rows-only", m.group(2), "-")
            continue
        m = re.match(r"\[(FAIL|SLOW)\] (\w+):", line)
        if m and m.group(2) not in rows:
            rows[m.group(2)] = (m.group(1), "-", "-")

n_ok = sum(1 for v in rows.values() if v[0] in ("ok", "rows-only"))
n_bad = len(rows) - n_ok
print(f"<!-- {len(rows)} rows: {n_ok} ok, {n_bad} fail/slow -->")
print("| query | sf1 hash | rows | oracle s |")
print("|---|---|---|---|")
for k in sorted(rows):
    st, n, t = rows[k]
    print(f"| {k} | {st} | {n} | {t} |")
