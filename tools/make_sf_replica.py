#!/usr/bin/env python
"""Materialize an sfN-equivalent testdata directory from sf0.1.

No sf1 testdata ships in /root/testdata, so the 10x point for the
full-headline bench (round-7 verdict #4) is built by replicating the
sf0.1 FACT tables k times with disjoint keys while keeping referential
integrity intact:

- region/nation/supplier/part copy unchanged (dims don't scale — the
  same reason the engine broadcasts them);
- customer/orders/lineitem replicate with consistent key offsets so
  every TPC-H join still resolves;
- events replicate with fresh event_id/user_id per replica and the SAME
  timestamps — 10x density per day-partition, which is how real ingest
  grows;
- documents replicate with a per-replica token suffix (replica 0 stays
  byte-identical to sf0.1), preserving near-dup structure: every
  template group grows k-fold — the hard case for LSH banding;
- embeddings replicate with a tiny deterministic per-replica rotation,
  so replica vectors are near- but not exactly-identical (the realistic
  hard case for cosine dedup).

Usage: python tools/make_sf_replica.py [--k 10] [--out DIR]
Then:  SPARK_GRAFT_SF_DIR=DIR python bench.py
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COPY = ["region", "nation", "supplier", "part"]
OID, CID, EID, UID, DID, VID = (10_000_000, 1_000_000, 10_000_000,
                                1_000_000, 10_000_000, 10_000_000)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default="/tmp/zdb_sf1")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pyspark.sql import DataFrame, functions as F

    from zdb_spark.session import get_spark

    spark = get_spark("zdb-make-sf-replica")
    spark.sparkContext.setLogLevel("ERROR")
    done = os.path.join(args.out, "_DONE")
    if os.path.exists(done):
        print(f"{args.out} already built")
        return 0
    shutil.rmtree(args.out, ignore_errors=True)
    os.makedirs(args.out)

    def rd(name: str) -> DataFrame:
        return spark.read.parquet(f"{args.sf_dir}/{name}.parquet")

    def wr(df: DataFrame, name: str, parts: int) -> None:
        # one flat parquet FILE-compatible dir per table, like testdata
        df.repartition(parts).write.mode("overwrite") \
          .parquet(f"{args.out}/{name}.parquet")
        n = spark.read.parquet(f"{args.out}/{name}.parquet").count()
        print(f"{name}: {n} rows", flush=True)

    for t in COPY:
        wr(rd(t), t, 1)

    def times_k(df: DataFrame, build) -> DataFrame:
        out = None
        for i in range(args.k):
            r = build(df, i)
            out = r if out is None else out.unionByName(r)
        return out

    wr(times_k(rd("customer"), lambda d, i: d.withColumn(
        "c_custkey", F.col("c_custkey") + F.lit(i * CID))),
       "customer", 4)
    wr(times_k(rd("orders"), lambda d, i: d
               .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * OID))
               .withColumn("o_custkey", F.col("o_custkey") + F.lit(i * CID))),
       "orders", 8)
    wr(times_k(rd("lineitem"), lambda d, i: d.withColumn(
        "l_orderkey", F.col("l_orderkey") + F.lit(i * OID))),
       "lineitem", 16)
    wr(times_k(rd("events"), lambda d, i: d
               .withColumn("event_id", F.col("event_id") + F.lit(i * EID))
               .withColumn("user_id", F.col("user_id") + F.lit(i * UID))),
       "events", 16)
    wr(times_k(rd("documents"), lambda d, i: d
               .withColumn("doc_id", F.col("doc_id") + F.lit(i * DID))
               .withColumn("text", F.col("text") if i == 0 else
                           F.concat(F.col("text"), F.lit(f" replica{i}")))),
       "documents", 8)

    def emb_rep(d: DataFrame, i: int) -> DataFrame:
        if i == 0:
            return d
        v = F.col("embedding").cast("array<double>")
        rot = F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda j: F.element_at(v, j.cast("int"))
            + F.lit(0.001 * i) * F.element_at(v, ((j % 64) + 1).cast("int")))
        return (d.withColumn("vec_id", F.col("vec_id") + F.lit(i * VID))
                 .withColumn("embedding", rot.cast("array<float>")))

    wr(times_k(rd("embeddings"), emb_rep), "embeddings", 4)

    open(done, "w").close()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
