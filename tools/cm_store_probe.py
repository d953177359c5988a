#!/usr/bin/env python
"""Round-13 operator scale probe: persisted count-min store
(build/append/compact/read), merge_kmv_samples, and the mp4/webm
container probes, at sf0.1 vs a 10x replica (tools/make_sf_replica.py
-> /tmp/zdb_sf1), one session.  Results recorded in SCALE.md
(§Round-13 operator additions).

Usage: python tools/cm_store_probe.py [--dirs sf0.1_dir,replica_dir]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def probe(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from zdb_spark.operators.multimodal import decode_video
    from zdb_spark.operators.sketches import (append_countmin_store,
                                              build_countmin_store,
                                              compact_countmin_store,
                                              countmin_store_lookup,
                                              kmv_sample,
                                              merge_kmv_samples)
    from zdb_spark.operators.text import tokenize

    out: dict = {}
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.count()                       # touch (page cache, codegen)
    toks = docs.select("doc_id",
                       F.explode(tokenize("text")).alias("tok"))
    n = docs.count()
    t1 = n // 2
    store = tempfile.mkdtemp(prefix="cm_probe_")
    shutil.rmtree(store)

    t0 = time.time()
    build_countmin_store(toks.where(F.col("doc_id") < t1), "tok",
                         store, depth=4, width=1024)
    out["build_countmin_store"] = round(time.time() - t0, 2)

    batch = toks.where((F.col("doc_id") >= t1)
                       & (F.col("doc_id") < t1 + 500))
    t0 = time.time()
    append_countmin_store(batch, "tok", store, batch_id="probe-1")
    out["append_countmin_store_500doc_batch"] = round(time.time() - t0, 2)

    t0 = time.time()
    compact_countmin_store(spark, store)
    out["compact_countmin_store"] = round(time.time() - t0, 2)

    t0 = time.time()
    countmin_store_lookup(spark, store,
                          ["customer", "join", "zz-absent"]).count()
    out["countmin_store_lookup"] = round(time.time() - t0, 2)
    shutil.rmtree(store, ignore_errors=True)

    d = docs.select("source", "doc_id",
                    F.length("text").cast("double").alias("v"))
    parts = [kmv_sample(d.where(F.col("doc_id") % 3 == e), "doc_id",
                        "source", k=256) for e in range(3)]
    t0 = time.time()
    merge_kmv_samples(parts, "doc_id", "source", k=256).count()
    out["merge_kmv_samples_3epochs_k256"] = round(time.time() - t0, 2)

    from zdb_spark.operators.sketches import (kmv_distinct,
                                              kmv_set_estimates)

    t0 = time.time()
    kmv_distinct(toks.select(F.col("tok")), "tok", k=1024).count()
    out["kmv_distinct_tokens_k1024"] = round(time.time() - t0, 2)

    half = n // 2
    t0 = time.time()
    kmv_set_estimates(toks.where(F.col("doc_id") < half).select("tok"),
                      toks.where(F.col("doc_id") >= half).select("tok"),
                      "tok", k=1024).count()
    out["kmv_set_estimates_k1024"] = round(time.time() - t0, 2)

    from zdb_spark.operators.search import (append_text_index,
                                            build_text_index,
                                            text_index_topk)

    idx = tempfile.mkdtemp(prefix="ti_probe_")
    shutil.rmtree(idx)
    t0 = time.time()
    build_text_index(docs.where(F.col("doc_id") < t1), idx)
    out["build_text_index"] = round(time.time() - t0, 2)
    t0 = time.time()
    append_text_index(docs.where(F.col("doc_id") >= t1), idx,
                      batch_id=1)
    out["append_text_index"] = round(time.time() - t0, 2)
    t0 = time.time()
    text_index_topk(spark, idx, "table scan fast", k=15).count()
    out["text_index_topk_3terms"] = round(time.time() - t0, 2)
    shutil.rmtree(idx, ignore_errors=True)

    def synth(batches):
        import pandas as pd

        from zdb_spark.operators.multimodal import (mp4_encode,
                                                    webm_encode)

        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                if i % 2 == 0:
                    blob = mp4_encode(160, 90, 24, 1.0)
                else:
                    blob = webm_encode(160, 90, 1.0)
                rows.append((i, blob))
            yield pd.DataFrame(rows, columns=["doc_id", "blob"])

    vids = (docs.select("doc_id")
            .mapInPandas(synth, "doc_id long, blob binary"))
    t0 = time.time()
    (decode_video(vids.where(F.col("doc_id") % 2 == 0),
                  id_col="doc_id", decoder="mp4")
     .unionByName(decode_video(vids.where(F.col("doc_id") % 2 == 1),
                               id_col="doc_id", decoder="webm"))
     .count())
    out["container_probe_mp4_webm"] = round(time.time() - t0, 2)
    out["n_docs"] = n
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs",
                    default="/root/testdata/sf0.1,/tmp/zdb_sf1")
    args = ap.parse_args()

    from zdb_spark.session import get_spark

    spark = get_spark("cm-store-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for d in args.dirs.split(","):
        if not os.path.isdir(d):
            print(f"skip {d}: not a directory", file=sys.stderr)
            continue
        results[d] = probe(spark, d)
    print(json.dumps(results, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
