#!/usr/bin/env python
"""Scale-growth probe: run the heavy text-dedup operators on 1x/4x/10x
replicas of the documents corpus and print per-scale timings as JSON.

Purpose: measured evidence (recorded in SCALE.md) that the operators'
cost grows ~linearly with corpus size — i.e. the candidate-generation
stages stay bounded and nothing quietly degrades toward all-pairs.
Replicas perturb each copy with a replica-specific token suffix so the
near-dup structure is preserved (each template group grows k-fold) while
doc_ids stay distinct — the hard case for LSH banding, since hot buckets
grow k-fold too.

Usage: python tools/scale_probe.py [--scales 1,4,10]
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
    ap.add_argument("--cap", type=int, default=None,
                    help="max_bucket_size for minhash (measures the "
                         "hot-bucket cap's effect on the growth curve)")
    ap.add_argument("--workdir", default=None,
                    help="dir for per-scale pair parquet artifacts "
                         "(default: a fresh temp dir)")
    args = ap.parse_args()
    if args.workdir is None:
        import tempfile
        args.workdir = tempfile.mkdtemp(prefix="zdb_scale_probe_")

    # Heavy scales (50x/100x) need real executor memory: the 8g default
    # heap shared by 32 task threads exhausts the unified pool during the
    # cluster rounds' sort-merge joins (measured: UNABLE_TO_ACQUIRE_MEMORY
    # at 50x).  On a real cluster this is per-executor memory; locally the
    # one JVM stands in for the whole fleet, so size it like one.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from pyspark.sql import functions as F

    from zdb_spark.operators.dedup import (duplicate_clusters, exact_dedup,
                                           minhash_lsh_pairs, release)
    from zdb_spark.operators.text import quality_features
    from zdb_spark.session import get_spark

    spark = get_spark("zdb-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    n0 = docs.count()
    out = {"base_docs": n0, "scales": {}}

    for k in [int(s) for s in args.scales.split(",")]:
        # Keep per-partition shuffle volume ~constant as the corpus grows
        # — the same spark.sql.shuffle.partitions scaling a 100 TB
        # deployment applies (AQE still coalesces small stages down).
        spark.conf.set("spark.sql.shuffle.partitions", str(max(32, 4 * k)))
        reps = [
            docs.select((F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                        F.concat(F.col("text"), F.lit(f" replica{i}"))
                        .alias("text"))
            for i in range(k)
        ]
        corpus = reps[0]
        for r in reps[1:]:
            corpus = corpus.unionByName(r)
        corpus = corpus.repartition(spark.sparkContext.defaultParallelism) \
                       .cache()
        corpus.count()

        timings = {}
        t0 = time.time()
        timings["exact_dedup"] = (exact_dedup(corpus).count(),
                                  round(time.time() - t0, 2))
        t0 = time.time()
        timings["text_quality"] = (quality_features(corpus, "text").count(),
                                   round(time.time() - t0, 2))

        # Pair stage MATERIALIZES to parquet, then the pair pipeline is
        # hard-released before clustering.  At 50x the exact-verify join
        # legitimately shuffles tens of GB of shingle arrays (6M+ true
        # pairs × ~2.4KB/side); those shuffle files stay on disk as long
        # as Python holds the pair plan, so clustering straight off the
        # live plan stacks BOTH footprints and filled this box's disk
        # twice (measured).  Persisting the pair artifact and clustering
        # from the compact parquet is also the production shape: the
        # pair set is a reusable output, not a transient.
        pairs_path = os.path.join(args.workdir, f"pairs_{k}.parquet")
        t0 = time.time()
        pairs = minhash_lsh_pairs(corpus, "text", "doc_id",
                                  num_hashes=64, bands=16, threshold=0.5,
                                  max_bucket_size=args.cap)
        pairs.write.mode("overwrite").parquet(pairs_path)
        timings_minhash_sec = round(time.time() - t0, 2)
        dropped_stats = None
        if args.cap is not None:
            db = pairs._zdb_dropped_buckets
            drow = db.agg(F.count(F.lit(1)).alias("n"),
                          F.max("bucket_size").alias("mx")).collect()[0]
            dropped_stats = {"n_buckets": drow["n"],
                             "max_bucket": drow["mx"]}
        release(pairs)
        del pairs
        import gc as _gc
        _gc.collect()                      # drop py4j refs to the plan
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()  # reclaim verify shuffles NOW
        pairs_df = spark.read.parquet(pairs_path)
        n_pairs = pairs_df.count()
        timings["minhash_pairs"] = (n_pairs, timings_minhash_sec)

        t0 = time.time()
        # driver_threshold=0: always measure the DISTRIBUTED path — the
        # one a 100 TB pair graph takes (the driver union-find fast path
        # would otherwise absorb the small scales)
        clusters = duplicate_clusters(pairs_df, driver_threshold=0)
        timings["clusters"] = (clusters.count(),
                               round(time.time() - t0, 2))
        cluster_rounds = getattr(clusters, "_zdb_rounds", None)
        release(clusters)
        out["scales"][k] = {"docs": n0 * k,
                            "cluster_rounds": cluster_rounds,
                            **({"dropped": dropped_stats}
                               if dropped_stats else {}),
                            **{name: {"rows": r, "sec": s}
                               for name, (r, s) in timings.items()}}
        # flush per scale: a crash at 100x must not lose the 50x numbers
        print(json.dumps({"scale": k, **out["scales"][k]}), flush=True)
        corpus.unpersist()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
