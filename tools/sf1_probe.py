#!/usr/bin/env python
"""One-off sf1 spot-run of the heavy dedup family (round-7 verdict #8).

No sf1 testdata ships in /root/testdata, so the sf1-equivalent corpus is
the sf0.1 documents/embeddings replicated 10x (the same replica
construction tools/scale_probe.py uses: per-replica text suffix keeps the
near-dup structure while doc_ids stay distinct; embeddings get a tiny
deterministic per-replica rotation so replica vectors are near- but not
exactly-identical — the realistic hard case for cosine dedup).

Runs the three heavy gate operators EXACTLY as gated, with their scale
guards engaged:
  - dedup_minhash: minhash_lsh_pairs(64 hashes, 16 bands, max_bucket_size=64)
  - dedup_spans:   char_fingerprint_pairs(n=24, mod=8, max_bucket_size=64)
  - semantic_dedup: cells scaled with the corpus (n_clusters = 16 * k,
    learned centroids), max_cluster_size guard active

and prints wall-times at 1x (sf0.1) and 10x (sf1-equivalent) plus the
fitted growth exponent log(t10/t1)/log(10).  Paste into SCALE.md.

Usage: python tools/sf1_probe.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--scales", default="1,10")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from pyspark.sql import functions as F

    from zdb_spark.operators.dedup import (char_fingerprint_pairs,
                                           minhash_lsh_pairs, release)
    from zdb_spark.operators.similarity import semantic_dedup
    from zdb_spark.session import get_spark

    spark = get_spark("zdb-sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    emb = (spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
           .select("vec_id",
                   F.transform("embedding", lambda x: x.cast("double"))
                   .alias("embedding")))
    out = {"base_docs": docs.count(), "base_vecs": emb.count(),
           "scales": {}}

    for k in [int(s) for s in args.scales.split(",")]:
        spark.conf.set("spark.sql.shuffle.partitions", str(max(32, 4 * k)))
        dreps, ereps = [], []
        for i in range(k):
            dreps.append(docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" replica{i}")).alias("text")))
            # tiny deterministic per-replica perturbation: scale one
            # coordinate — replicas stay ~0.999 cosine to the original
            ereps.append(emb.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, j: F.when(j == i % 16, x * (1.0 + 0.01 * i))
                                  .otherwise(x)).alias("embedding")))
        corpus, vecs = dreps[0], ereps[0]
        for r in dreps[1:]:
            corpus = corpus.unionByName(r)
        for r in ereps[1:]:
            vecs = vecs.unionByName(r)
        corpus = corpus.repartition(
            spark.sparkContext.defaultParallelism).cache()
        vecs = vecs.repartition(
            spark.sparkContext.defaultParallelism).cache()
        n_docs, n_vecs = corpus.count(), vecs.count()

        row = {"docs": n_docs, "vecs": n_vecs}

        t0 = time.time()
        pairs = minhash_lsh_pairs(corpus, "text", "doc_id", num_hashes=64,
                                  bands=16, threshold=0.5,
                                  max_bucket_size=64)
        n_pairs = pairs.count()
        row["dedup_minhash"] = {"pairs": n_pairs,
                                "sec": round(time.time() - t0, 2)}
        release(pairs)

        t0 = time.time()
        spans = char_fingerprint_pairs(corpus, "text", "doc_id", n=24,
                                       mod=8, min_shared=2,
                                       max_bucket_size=64)
        n_spans = spans.count()
        row["dedup_spans"] = {"pairs": n_spans,
                              "sec": round(time.time() - t0, 2)}

        t0 = time.time()
        sem = semantic_dedup(vecs, "embedding", "vec_id", threshold=0.95,
                             n_clusters=16 * k, max_cluster_size=100_000)
        n_dropped = sem.where(~F.col("keep")).count()
        row["semantic_dedup"] = {"dropped": n_dropped,
                                 "sec": round(time.time() - t0, 2)}
        release(sem)

        out["scales"][k] = row
        print(json.dumps({"scale": k, **row}), flush=True)
        corpus.unpersist()
        vecs.unpersist()
        spark.catalog.clearCache()

    ks = sorted(out["scales"])
    if len(ks) >= 2:
        lo, hi = ks[0], ks[-1]
        for op in ("dedup_minhash", "dedup_spans", "semantic_dedup"):
            t_lo = out["scales"][lo][op]["sec"]
            t_hi = out["scales"][hi][op]["sec"]
            exp = (math.log(t_hi / t_lo) / math.log(hi / lo)
                   if t_lo > 0 else None)
            out.setdefault("growth_exponent", {})[op] = (
                round(exp, 2) if exp is not None else None)
    print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
