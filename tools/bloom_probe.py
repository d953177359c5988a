#!/usr/bin/env python
"""Round-13 second-wave scale probe: the Bloom membership family
(bloom_words / bloom_lookup / persisted store build+append+read),
bloom-prefiltered decontamination, and n-gram novelty, at sf0.1 vs a
10x replica (tools/make_sf_replica.py -> /tmp/zdb_sf1), one session.
Results recorded in SCALE.md (§Round-13 operator additions).

The interesting scale claims under test:
- bloom_words' shuffle is bounded by m_bits/32 word rows, so build
  time should grow with the SCAN (≈ linear in corpus), never worse;
- bloom_lookup / store reads touch word rows only, so probe latency
  should be ~flat across corpus size;
- contamination_bloom keeps the corpus un-shuffled through k broadcast
  probes, so it should scale like contamination (scan-bound);
- ngram_novelty pays one gram-keyed partial agg (the exact-dedup
  class) and doc-sized joins only.

Usage: python tools/bloom_probe.py [--dirs sf0.1_dir,replica_dir]
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

_M, _K = 1 << 20, 4


def probe(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from zdb_spark.operators.curation import (contamination_bloom,
                                              ngram_novelty)
    from zdb_spark.operators.sketches import (append_bloom_store,
                                              bloom_lookup,
                                              bloom_store_lookup,
                                              bloom_words,
                                              build_bloom_store,
                                              compact_bloom_store)
    from zdb_spark.operators.text import tokenize

    out: dict = {}
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = docs.count()                   # touch (page cache, codegen)
    toks = docs.select("doc_id",
                       F.explode(tokenize("text")).alias("tok"))

    t0 = time.time()
    words = bloom_words(toks, "tok", m_bits=_M, k=_K)
    n_words = words.count()
    out["bloom_words_build_m1M_k4"] = round(time.time() - t0, 2)
    out["bloom_word_rows"] = n_words   # bounded by m/32 = 32768

    probes = ["customer", "join", "scan", "zz-absent-1", "zz-absent-2"]
    t0 = time.time()
    bloom_lookup(words, probes, m_bits=_M, k=_K).count()
    out["bloom_lookup_5probes"] = round(time.time() - t0, 2)

    store = tempfile.mkdtemp(prefix="bloom_probe_")
    shutil.rmtree(store)
    t1 = n // 2
    t0 = time.time()
    build_bloom_store(toks.where(F.col("doc_id") < t1), "tok", store,
                      m_bits=_M, k=_K)
    out["build_bloom_store"] = round(time.time() - t0, 2)
    batch = toks.where((F.col("doc_id") >= t1)
                       & (F.col("doc_id") < t1 + 500))
    t0 = time.time()
    append_bloom_store(batch, "tok", store, batch_id="probe-1")
    out["append_bloom_store_500doc_batch"] = round(time.time() - t0, 2)
    t0 = time.time()
    bloom_store_lookup(spark, store, probes).count()
    out["bloom_store_lookup"] = round(time.time() - t0, 2)
    t0 = time.time()
    compact_bloom_store(spark, store)
    out["compact_bloom_store"] = round(time.time() - t0, 2)
    shutil.rmtree(store, ignore_errors=True)

    bench = docs.where(F.col("doc_id") < 20)
    t0 = time.time()
    contamination_bloom(docs, bench, m_bits=1 << 18, k=4).count()
    out["contamination_bloom"] = round(time.time() - t0, 2)

    t0 = time.time()
    ngram_novelty(docs, n=5).count()
    out["ngram_novelty_n5"] = round(time.time() - t0, 2)

    from zdb_spark.operators.curation import ngram_novelty_vs_bloom
    from zdb_spark.operators.text import _ngram_col, tokenize

    hist = (docs.where(F.col("doc_id") < t1)
            .select(F.explode(F.array_distinct(
                _ngram_col(tokenize("text"), 5))).alias("gram")))
    hwords = bloom_words(hist, "gram", m_bits=_M, k=_K)
    t0 = time.time()
    ngram_novelty_vs_bloom(docs, hwords, n=5, m_bits=_M, k=_K).count()
    out["ngram_novelty_vs_bloom"] = round(time.time() - t0, 2)

    from zdb_spark.operators.layout import (file_span_stats,
                                            write_zordered)

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if ev.schema["ts"].dataType.typeName() in ("timestamp",
                                               "timestamp_ntz"):
        ev = ev.withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp"))
            * F.lit(1000))
    zdir = tempfile.mkdtemp(prefix="zorder_probe_")
    t0 = time.time()
    write_zordered(ev, zdir, ["ts", "value"], bits=12, n_files=16)
    out["write_zordered_16files"] = round(time.time() - t0, 2)
    spans = file_span_stats(spark, zdir, ["ts", "value"]).collect()
    out["zorder_mean_span_ts"] = round(
        sum(r["span_ts"] for r in spans) / len(spans), 3)
    out["zorder_mean_span_value"] = round(
        sum(r["span_value"] for r in spans) / len(spans), 3)
    shutil.rmtree(zdir, ignore_errors=True)
    out["n_docs"] = n
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs",
                    default="/root/testdata/sf0.1,/tmp/zdb_sf1")
    args = ap.parse_args()

    from zdb_spark.session import get_spark

    spark = get_spark("bloom-probe")
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
