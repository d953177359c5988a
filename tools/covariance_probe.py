#!/usr/bin/env python
"""A/B the two embedding_covariance paths across dimensions.

The exact (decimal posexplode) path materializes a d² array PER ROW
before the explode — fine at d=64 (32 KB/row), hostile at d≥512
(2-8 MB/row).  The gram path (per-partition BLAS matmul partials) is
O(d²) per PARTITION.  This probe measures both on synthetic corpora at
several d and prints wall seconds + the agreement error, evidence for
SCALE.md's "which path at which d" guidance.

Usage: python tools/covariance_probe.py [--dims 64,256] [--rows 20000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="64,256")
    ap.add_argument("--rows", type=int, default=20000)
    args = ap.parse_args()

    import numpy as np

    from zdb_spark.operators.similarity import embedding_covariance
    from zdb_spark.session import get_spark

    spark = get_spark("cov-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for d in [int(x) for x in args.dims.split(",")]:
        rng = np.random.default_rng(d)
        x = rng.normal(size=(args.rows, d)).astype(np.float32)
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(x)],
            "vec_id long, embedding array<float>").repartition(32)
        df.persist().count()        # exclude data gen from both sides
        out = {}
        for method in ("exact", "gram"):
            best = None
            for _ in range(2):
                t0 = time.time()
                rows = embedding_covariance(df, dim=d,
                                            method=method).collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            out[method] = (best, {(r.i, r.j): r.cov for r in rows})
        err = max(abs(out["exact"][1][k] - out["gram"][1][k])
                  for k in out["exact"][1])
        print(f"d={d:5d} rows={args.rows}  exact={out['exact'][0]:7.2f}s  "
              f"gram={out['gram'][0]:7.2f}s  "
              f"speedup={out['exact'][0]/out['gram'][0]:5.1f}x  "
              f"max|Δ|={err:.2e}", flush=True)
        df.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
