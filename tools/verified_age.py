#!/usr/bin/env python
"""Print driver-verified age per queries() gate.

Scans CORRECTNESS_r*.json for the latest round in which each gate had a
fully-green row (rows+schema+hash) and prints one line per gate, stalest
first.  Gates never driver-verified sort before everything else.  Use this
to choose the first-50 window rotation each round: stalest green first,
plus anything whose implementation changed since its last green row.

Usage: python tools/verified_age.py [--repo DIR]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys


def load_history(repo: str) -> dict[str, tuple[int, bool]]:
    """gate -> (latest round seen, was it fully green that round)."""
    hist: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for gate, row in data.items():
            green = bool(row.get("rows_match") and row.get("schema_match")
                         and row.get("hash_match"))
            prev = hist.get(gate)
            # keep the LATEST GREEN round; a later red round is reported too
            if green:
                if prev is None or rnd >= prev[0] or not prev[1]:
                    hist[gate] = (rnd, True)
            elif prev is None:
                hist[gate] = (rnd, False)
    return hist


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default="/root/repo")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    import __spark_entry__ as entry_mod

    gates = list(entry_mod.queries())
    hist = load_history(args.repo)

    def sort_key(g: str):
        h = hist.get(g)
        if h is None:
            return (0, 0, g)          # never verified: stalest of all
        rnd, green = h
        if not green:
            return (1, rnd, g)        # last driver row was red
        return (2, rnd, g)            # green in round rnd; older = staler

    print(f"{'gate':34s} {'last-green':>10s}  window-pos")
    window = {g: i + 1 for i, g in enumerate(gates[:50])}
    for g in sorted(gates, key=sort_key):
        h = hist.get(g)
        if h is None:
            status = "NEVER"
        elif not h[1]:
            status = f"RED r{h[0]}"
        else:
            status = f"r{h[0]}"
        pos = str(window.get(g, "-"))
        print(f"{g:34s} {status:>10s}  {pos}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
