#!/usr/bin/env python3
"""Collate sf1 gate logs into the PLANS.md markdown table.

Usage: python3 tools/gate_table.py LOG [LOG...] > table.md
       python3 tools/gate_table.py --selftest

Parses verify_local.py output lines:
  [ ok ] name: N rows (oracle T s)
  [rows] name: N rows (no oracle — rows-only)
  [FAIL] name: ...
  [SLOW] name: ...
Later logs win UNIFORMLY (r15 ADVICE: FAIL/SLOW also overwrite an
earlier ok, so a regression in a rerun log can't be silently masked);
a key whose status flips between logs gets a warning comment.
--selftest pins exactly that contract (r16 verdict item #6): an
earlier ok followed by a later FAIL must collate to FAIL + a flip
warning, and the reverse order to ok + a flip warning.
"""
import re
import sys


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


def collate(line_lists):
    """Fold parsed lines from logs IN ORDER; the last status for a key
    wins regardless of which status it is. Returns (rows, flipped)."""
    rows, flipped = {}, {}
    for lines in line_lists:
        for line in lines:
            hit = parse(line)
            if hit is None:
                continue
            key, new = hit
            if key in rows and rows[key][0] != new[0]:
                flipped[key] = (rows[key][0], new[0])
            rows[key] = new
    return rows, flipped


def selftest():
    ok = "[ ok ] q1: 5 rows (oracle 0.10s)"
    fail = "[FAIL] q1: hash mismatch"
    slow = "[SLOW] q2: 99s"
    # later FAIL must overwrite an earlier ok (the masking bug)
    rows, flipped = collate([[ok], [fail]])
    assert rows["q1"][0] == "FAIL", rows
    assert flipped["q1"] == ("ok", "FAIL"), flipped
    # later ok must overwrite an earlier FAIL (a fixed rerun)
    rows, flipped = collate([[fail], [ok]])
    assert rows["q1"][0] == "ok", rows
    assert flipped["q1"] == ("FAIL", "ok"), flipped
    # same-status rerun: last wins silently, no flip warning
    rows, flipped = collate([[ok], [ok]])
    assert rows["q1"][0] == "ok" and not flipped, (rows, flipped)
    # SLOW parses and counts as bad; unknown lines are ignored
    rows, flipped = collate([[slow, "noise line"]])
    assert rows["q2"][0] == "SLOW" and len(rows) == 1, rows
    print("gate_table selftest: ok")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest()
        sys.exit(0)
    logs = []
    for p in sys.argv[1:]:
        with open(p) as f:
            logs.append(f.readlines())
    rows, flipped = collate(logs)
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
