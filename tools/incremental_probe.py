#!/usr/bin/env python
"""Incremental-dedup probe: measure per-batch cost of
``incremental_minhash_pairs`` against a persisted signature store vs the
full ``minhash_lsh_pairs`` re-run it replaces.

Corpus = documents replicated K times (same construction as
scale_probe.py); batch = one more 1x replica with fresh ids.  The full
re-run must re-shingle corpus+batch; the incremental path signs only the
batch and joins the stored band rows.  The printed JSON goes into
SCALE.md's dedup section as the store's amortization evidence.

Usage: python tools/incremental_probe.py [--corpus-scale 10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _replica(docs, i):
    from pyspark.sql import functions as F

    return docs.select(
        (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(f" replica{i}")).alias("text"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--corpus-scale", type=int, default=10)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

    from zdb_spark.operators.dedup import (build_minhash_store,
                                           incremental_minhash_pairs,
                                           minhash_lsh_pairs, release)
    from zdb_spark.session import get_spark

    spark = get_spark("zdb-incremental-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    par = spark.sparkContext.defaultParallelism

    k = args.corpus_scale
    corpus = _replica(docs, 0)
    for i in range(1, k):
        corpus = corpus.unionByName(_replica(docs, i))
    corpus = corpus.repartition(par).cache()
    n_corpus = corpus.count()
    batch = _replica(docs, k).repartition(par).cache()
    n_batch = batch.count()

    store = tempfile.mkdtemp(prefix="zdb_inc_probe_") + "/store"
    t0 = time.time()
    build_minhash_store(corpus, store)
    t_build = round(time.time() - t0, 2)

    t0 = time.time()
    inc = incremental_minhash_pairs(batch, corpus, store,
                                    assume_disjoint=True)
    n_inc = inc.count()
    t_inc = round(time.time() - t0, 2)
    release(inc)

    t0 = time.time()
    full = minhash_lsh_pairs(corpus.unionByName(batch))
    n_full = full.count()
    t_full = round(time.time() - t0, 2)
    release(full)

    print(json.dumps({
        "corpus_docs": n_corpus, "batch_docs": n_batch,
        "store_build_sec": t_build,
        "incremental": {"pairs": n_inc, "sec": t_inc},
        "full_rerun": {"pairs": n_full, "sec": t_full},
        "speedup": round(t_full / t_inc, 2) if t_inc else None,
    }))
    shutil.rmtree(os.path.dirname(store), ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
