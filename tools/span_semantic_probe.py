#!/usr/bin/env python
"""Scale-growth probe for the round-6 dedup additions.

- ``char_fingerprint_pairs`` (span dedup): replicas share their template
  spans ACROSS replicas, so the true-pair answer itself grows ~k² — the
  probe separates answer growth (pairs found) from machinery growth
  (wall time vs corpus size), and measures the hot-fingerprint cap's
  effect on both.
- ``semantic_dedup``: quadratic cost lives inside cluster cells, so the
  100 TB recipe is "scale cluster count with the corpus".  The probe
  runs k× corpora against FIXED cells (pathological: cells grow k-fold)
  and against cells ∝ k (the recommended shape) to show the curve
  difference the SCALE.md entry claims.

Usage: python tools/span_semantic_probe.py [--sf-dir /root/testdata/sf0.01]
Prints one JSON object; paste the numbers into SCALE.md.
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
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--scales", default="1,4,10")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from zdb_spark.operators.dedup import char_fingerprint_pairs
    from zdb_spark.operators.similarity import semantic_dedup
    from zdb_spark.session import get_spark

    spark = get_spark("zdb-span-sem-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    emb = (spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
           .select("vec_id", F.transform("embedding",
                                         lambda x: x.cast("double"))
                   .alias("embedding")))
    out = {"base_docs": docs.count(), "base_vecs": emb.count(),
           "spans": {}, "semantic": {}}

    for k in [int(s) for s in args.scales.split(",")]:
        reps = [docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" replica{i}")).alias("text"))
            for i in range(k)]
        corpus = reps[0]
        for r in reps[1:]:
            corpus = corpus.unionByName(r)
        corpus = corpus.repartition(
            spark.sparkContext.defaultParallelism).cache()
        n = corpus.count()

        row = {"docs": n}
        for cap, tag in ((None, "uncapped"), (64, "cap64")):
            t0 = time.time()
            pairs = char_fingerprint_pairs(corpus, "text", "doc_id",
                                           n=24, mod=8, min_shared=2,
                                           max_bucket_size=cap)
            cnt = pairs.count()
            row[tag] = {"pairs": cnt, "sec": round(time.time() - t0, 2)}
            if cap is not None:
                d = pairs._zdb_dropped_buckets.count()
                row[tag]["dropped_buckets"] = d
        out["spans"][k] = row
        corpus.unpersist()

        vreps = [emb.select(
            (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
            F.transform("embedding",
                        lambda x: x + F.lit(0.001 * i)).alias("embedding"))
            for i in range(k)]
        vcorp = vreps[0]
        for r in vreps[1:]:
            vcorp = vcorp.unionByName(r)
        vcorp = vcorp.repartition(
            spark.sparkContext.defaultParallelism).cache()
        nv = vcorp.count()

        vrow = {"vecs": nv}
        for n_clusters, tag in ((16, "fixed16"), (16 * k, "scaledk")):
            t0 = time.time()
            res = semantic_dedup(vcorp, "embedding", "vec_id",
                                 threshold=0.95, n_clusters=n_clusters,
                                 sample_size=4096, iters=5)
            kept = res.where(F.col("keep")).count()
            vrow[tag] = {"kept": kept, "sec": round(time.time() - t0, 2)}
            from zdb_spark.operators.dedup import release
            release(res)
        out["semantic"][k] = vrow
        vcorp.unpersist()

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
