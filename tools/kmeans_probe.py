#!/usr/bin/env python
"""k-means scale-growth probe: time kmeans_lloyd's 3 Lloyd iterations on
1x/4x/10x replicas of the embeddings table and print per-scale timings.

Purpose: measured evidence (recorded in SCALE.md) that an iteration's
cost is one linear scan — the shuffle stays k x d rows per partition at
every scale, so wall-time growth should track data growth minus the
fixed per-job overhead that dominates at sf0.1.

Replicas perturb each copy by a tiny deterministic offset so vectors
stay distinct while cluster structure is preserved.

Usage: python tools/kmeans_probe.py [--scales 1,4,10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--scales", default="1,4,10")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import functions as F

    from zdb_spark.operators.similarity import kmeans_lloyd
    from zdb_spark.session import get_spark

    spark = get_spark("kmeans_probe")
    base = spark.read.parquet(os.path.join(args.sf_dir,
                                           "embeddings.parquet"))
    n_base = base.count()
    init = [r["embedding"] for r in
            base.where(F.col("vec_id") < 4).orderBy("vec_id")
                .select("embedding").collect()]

    out = {}
    for k in scales:
        reps = [base.select(
            (F.col("vec_id") + F.lit(i * n_base)).alias("vec_id"),
            F.transform("embedding",
                        lambda x: x + F.lit(i * 1e-4)).alias("embedding"))
            for i in range(k)]
        df = reps[0]
        for r in reps[1:]:
            df = df.unionByName(r)
        df = df.localCheckpoint()        # pay replica build outside timing
        t0 = time.time()
        kmeans_lloyd(df, "embedding", init, iters=args.iters)
        dt = time.time() - t0
        out[f"{k}x"] = {"rows": n_base * k, "sec": round(dt, 2),
                        "sec_per_iter": round(dt / args.iters, 2)}
        print(f"{k}x ({n_base * k} rows): {dt:.2f}s", file=sys.stderr)
        df.unpersist()
    print(json.dumps({"metric": "kmeans_growth", "iters": args.iters,
                      "scales": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
