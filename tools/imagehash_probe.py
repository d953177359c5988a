#!/usr/bin/env python
"""Round-16 scale probe: the image near-dup pair join's densification
knobs (r15 verdict task 4).  SCALE.md §Round-15 documented that
image_dedup's banded pigeonhole join densifies as the corpus grows at
fixed chunk width and named three mitigations — lower max_hamming
(wider chunks), hot-bucket caps, sharding; this probe MEASURES the
first two, at 1x/10x/100x, hash-table-only (the decode stage is
per-row linear and already measured; the knob under test is the
Σ-per-bucket n² pair join).

Corpus: n 64-bit dhash-like fingerprints from an avalanche mixer
(splitmix64 — linear grids collapse perceptual-hash distributions,
the r15 fixture lesson), with a planted 2% near-dup tail at hamming
<= 3 so the verify stage has real work.

Configs per scale:
- mh6: max_hamming=6 (the image_dedup gate's setting — 7 chunks x 9
  bits, 512 buckets/chunk: the shape that went ~10x super-linear in
  the r15 probe);
- mh3: max_hamming=3 (4 chunks x 16 bits, 65536 buckets/chunk — the
  wider-chunk knob);
- mh6cap: max_hamming=6 with max_bucket_size=64 (the hot-bucket cap
  knob; recall trade documented in dedup.hamming_pairs).

Usage: python tools/imagehash_probe.py [--scales 1,10,100 --base 5000]
Prints one JSON line; record the table in SCALE.md §Round-16.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _hashes(spark, n: int):
    """n splitmix64-mixed fingerprints + a 2% near-dup tail at
    hamming EXACTLY 1/2/3 (cycling by id): the sibling XORs a run of
    1..3 adjacent bits at a per-id position, so the probe's recall
    claim covers the full ball the knobs trade over — not just
    distance 1 (r16 review fix)."""
    from pyspark.sql import functions as F

    def mix(col):
        z = (col + F.lit(-7046029254386353131)).cast("long")
        z = F.xxhash64(z)                      # avalanche, JVM-side
        return z

    base = spark.range(0, n).select(
        F.col("id"), mix(F.col("id")).alias("hash"))
    # mask = (2^nbits - 1) << pos with nbits in 1..3, pos in 0..57 —
    # adjacent distinct bits, no cancellation, distance == nbits
    mask = ("shiftleft(cast(shiftleft(1L, "
            "1 + cast((id div 50) % 3 as int)) - 1 as long), "
            "cast(id % 58 as int))")
    sib = (base.where(F.col("id") % 50 == 0)
           .select((F.col("id") + n).alias("id"),
                   F.col("hash").bitwiseXOR(F.expr(mask))
                   .alias("hash")))
    return base.unionByName(sib)


# Above this corpus size the max_hamming=6 shape (7 chunks x 9 bits =
# 512 buckets/chunk) is quadratic BY CONSTRUCTION: any n rows spread
# over 512 buckets mean n/512 rows per bucket and sum-per-bucket n^2 ~
# n^2/512 candidate pairs regardless of hash distribution — at 500k
# rows that is ~5e8 pairs per chunk and the join OOMs (measured, this
# probe's first run).  The honest probe records the bound instead of
# the crash; the density fixes at that size are wider chunks (mh3:
# 65536 buckets) or sharding, NOT the hot-bucket cap (at uniform
# density EVERY bucket crosses the cap and recall collapses to zero —
# the cap is a skew guard, not a density valve).
_MH6_MAX_N = 60_000


def probe(spark, n: int) -> dict:
    from zdb_spark.operators.dedup import hamming_pairs

    df = _hashes(spark, n).cache()
    df.count()
    out = {}
    for label, kwargs in (
            ("mh6", dict(max_hamming=6)),
            ("mh3", dict(max_hamming=3)),
            ("mh6cap", dict(max_hamming=6, max_bucket_size=64))):
        if kwargs["max_hamming"] == 6 and n > _MH6_MAX_N:
            out[label] = {"skipped": "512-bucket chunks are "
                          "quadratic by construction at this n "
                          "(~n^2/512 candidates)"}
            continue
        t0 = time.time()
        pairs = hamming_pairs(df, "hash", "id", **kwargs).count()
        out[label] = {"sec": round(time.time() - t0, 2),
                      "pairs": pairs}
    df.unpersist()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,100")
    ap.add_argument("--base", type=int, default=5000,
                    help="1x corpus size (the sf0.1 gate decodes 5000)")
    args = ap.parse_args()

    from zdb_spark import get_spark

    spark = get_spark("imagehash-probe")
    results = {}
    for s in (int(x) for x in args.scales.split(",")):
        results[f"{s}x"] = probe(spark, args.base * s)
        print(f"[probe] {s}x done: {results[f'{s}x']}",
              file=sys.stderr)
    print(json.dumps({"metric": "imagehash_pair_join",
                      "base": args.base, "results": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
