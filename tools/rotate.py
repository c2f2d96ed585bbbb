"""Compute the next round's queries() key order from correctness history.

The driver oracle-checks only the FIRST 50 `queries()` keys, so each
round the registry is reordered stalest-first (SURVEY §2b).  This tool
makes the rotation mechanical: it reads every CORRECTNESS_r*.json in
the repo root, finds each key's newest all-green round, and prints the
recommended order — never-checked keys first, then ascending by last
green round, original registry order as the tie-break.

Usage: python tools/rotate.py
Output: one key per line; a marker after line 50 shows the window edge.
The next-round builder reorders the `queries()` dict literal to match.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E


def last_green_rounds() -> dict[str, int]:
    """key → newest round with a fully-green driver row (rows+schema+
    hash for SQL-backed keys; rows_match for rows-only keys)."""
    out: dict[str, int] = {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        data = json.load(open(path))
        for key, row in data.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match")
                # absent ⇒ green (rows-only keys have no schema/hash row)
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            if green:
                out[key] = max(out.get(key, 0), rnd)
    return out


def main() -> None:
    keys = list(E.queries())
    greens = last_green_rounds()
    order = sorted(
        range(len(keys)),
        key=lambda i: (greens.get(keys[i], -1), i),
    )
    for rank, i in enumerate(order):
        k = keys[i]
        g = greens.get(k)
        print(f"{k}\t(last green: {'never' if g is None else f'r{g}'})")
        if rank == 49:
            print("---- 50-key driver window ends here ----")


if __name__ == "__main__":
    main()
