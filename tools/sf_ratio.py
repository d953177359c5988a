#!/usr/bin/env python
"""Compare two bench.py JSON outputs (e.g. sf0.1 vs the sf1 replica) and
print per-query wall-time ratios, flagging anything past --flag (the
round-7 verdict's >15x rule for a 10x data point).

Usage: python tools/sf_ratio.py BASE.json BIG.json [--flag 15]
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("big")
    ap.add_argument("--flag", type=float, default=15.0)
    args = ap.parse_args()

    with open(args.base) as f:
        base = json.load(f)
    with open(args.big) as f:
        big = json.load(f)
    qb, qg = base["queries"], big["queries"]
    common = [q for q in qg if q in qb]
    flagged = []
    print(f"{'query':24s} {'base':>8s} {'big':>8s} {'ratio':>7s}")
    for q in sorted(common, key=lambda q: -(qg[q] / max(qb[q], 1e-9))):
        r = qg[q] / max(qb[q], 1e-9)
        mark = "  <-- FLAG" if r > args.flag else ""
        print(f"{q:24s} {qb[q]:8.3f} {qg[q]:8.3f} {r:7.2f}{mark}")
        if r > args.flag:
            flagged.append(q)
    tb = sum(qb[q] for q in common)
    tg = sum(qg[q] for q in common)
    print(f"{'TOTAL (common)':24s} {tb:8.3f} {tg:8.3f} {tg / tb:7.2f}")
    missing = sorted(set(qb) - set(qg))
    errs = big.get("errors", {})
    if missing:
        print(f"missing from big run: {missing}")
    if errs:
        print(f"errors in big run: {errs}")
    print(json.dumps({"total_ratio": round(tg / tb, 3),
                      "flagged": flagged, "n_common": len(common)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
