#!/usr/bin/env python
"""ANN index maintenance probe: measured cost of appending a batch to a
persisted LSH/IVF index vs rebuilding the index from scratch, plus the
compaction cost that makes appends sustainable.

Purpose: evidence for SCALE.md that index maintenance is O(batch), not
O(corpus) — at 100 TB a rebuild-per-append is untenable (VERDICT r2
item 3).  The corpus is synthesized (sf0.1 embeddings is only 2k rows —
pure overhead at probe scale); dim matches the testdata embeddings.

Usage: python tools/ann_append_probe.py [--rows 200000] [--batch-frac 0.05]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--batch-frac", type=float, default=0.05)
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from zdb_spark.operators import similarity as sim
    from zdb_spark.session import get_spark

    spark = get_spark("zdb-ann-append-probe")
    spark.sparkContext.setLogLevel("ERROR")

    n, dim = args.rows, args.dim
    n_batch = int(n * args.batch_frac)
    # deterministic synthetic vectors, generated distributed (no driver
    # materialization): element j of row i = hash-derived uniform
    def synth(lo: int, hi: int):
        return spark.range(lo, hi).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: (F.pmod(F.xxhash64(F.col("id"), j), F.lit(10_000))
                           .cast("double") / 5_000.0 - 1.0).cast("float")
            ).alias("embedding"))

    corpus = synth(0, n).cache()
    corpus.count()
    # the batch is generated INDEPENDENTLY of the corpus frame — an
    # append's cost must be measured without any O(corpus) source scan
    batch = synth(n, n + n_batch).cache()
    batch.count()

    out = {"rows": n, "batch_rows": n_batch, "dim": dim}
    root = tempfile.mkdtemp(prefix="zdb_ann_probe_")

    for kind, build, append in [
        ("lsh",
         lambda df, p: sim.build_lsh_index(df, p, num_bits=12,
                                           num_tables=8, dim=dim),
         sim.append_lsh_index),
        ("ivf",
         lambda df, p: sim.build_ivf_index(df, p, n_centroids=64,
                                           sample_size=4096),
         sim.append_ivf_index),
    ]:
        p = os.path.join(root, kind)
        t0 = time.monotonic()
        build(corpus, p)
        t_build = time.monotonic() - t0
        t0 = time.monotonic()
        append(batch, p)
        t_append = time.monotonic() - t0
        files_before = len(sim.index_data_files(p))
        t0 = time.monotonic()
        files_after = sim.compact_ann_index(spark, p)
        t_compact = time.monotonic() - t0
        out[kind] = {
            "build_s": round(t_build, 2),
            "append_s": round(t_append, 2),
            "append_vs_build": round(t_append / t_build, 3),
            "compact_s": round(t_compact, 2),
            "files_before_compact": files_before,
            "files_after_compact": files_after,
        }

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
