#!/usr/bin/env python
"""Write-path throughput benchmark, mirroring the reference's only bench
(/root/reference/benches/write.rs:89-98: generate OHLCV-shaped rows,
append through the table write path, time it).

Measures BOTH ingest routes and prints ONE JSON line:

    {"metric": "write_throughput", "unit": "rows_per_sec",
     "batch_write": N, "stream_sink": M, "rows": R}

- ``batch_write``: rows/sec through ``Table.write`` (schema validation,
  ordered-append check, resolution rounding, dt derivation, range
  repartition, sorted parquet append, sidecar update — the whole
  contract, not a bare parquet dump).
- ``stream_sink``: rows/sec through the checkpointed Structured
  Streaming file sink (``stream_writer``, availableNow), the
  exactly-once ingest route.

Row count defaults to 2_000_000 (Spark's per-batch overhead is a fixed
~seconds; the reference's 1_000-row batches would measure JVM latency,
not throughput — at 100 TB what matters is sustained rows/sec).
Override with $SPARK_GRAFT_WRITE_ROWS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NS = 1_000_000_000
DAY = 86_400 * NS
T0 = 1704067200 * NS  # 2024-01-01T00:00:00Z


def measure_write_throughput(spark, n_rows: int,
                             batch_only: bool = False) -> dict:
    """Time both ingest routes; returns the metric dict (also reused by
    bench.py so the driver-recorded BENCH_r{N}.json tracks ingest
    regressions round-over-round, not just read-side queries)."""
    from pyspark.sql import functions as F

    from zdb_spark.schema import ColumnType, PartitionBy, Schema
    from zdb_spark.streaming.ingest import stream_writer
    from zdb_spark.table import Table

    home = tempfile.mkdtemp(prefix="zdb_bench_write_")

    def ohlcv_schema(name: str) -> Schema:
        return (Schema(name)
                .add_col("ticker", ColumnType.SYMBOL16)
                .add_col("open", ColumnType.F32)
                .add_col("high", ColumnType.F32)
                .add_col("low", ColumnType.F32)
                .add_col("close", ColumnType.F32)
                .add_col("close_un", ColumnType.F32)
                .add_col("volume", ColumnType.U64)
                .with_partition_by(PartitionBy.DAY))

    # Deterministic synthetic OHLCV rows, built JVM-side (the generator
    # must not be the bottleneck being measured): ~30 days of data so the
    # write path exercises real multi-partition fan-out.
    def gen_rows():
        step = (30 * DAY) // n_rows
        df = spark.range(n_rows).select(
            (F.lit(T0) + F.col("id") * F.lit(max(step, 1))).alias("ts"),
            (F.concat(F.lit("S"), (F.col("id") % 676).cast("string"))
             ).alias("ticker"),
            (F.col("id") % 1000 / 10.0).cast("float").alias("open"),
            (F.col("id") % 1000 / 9.0).cast("float").alias("high"),
            (F.col("id") % 1000 / 11.0).cast("float").alias("low"),
            (F.col("id") % 1000 / 10.5).cast("float").alias("close"),
            (F.col("id") % 1000 / 10.2).cast("float").alias("close_un"),
            (F.col("id") % 10_000).cast("long").alias("volume"))
        return df

    src = gen_rows().cache()
    src.count()  # materialize the generator outside the timed region

    try:
        # Each route runs TWICE (fresh table/sink per run) and the faster
        # run is recorded — same environment-noise policy as the read
        # bench: a shared box has produced 4x swings on single samples,
        # and min-of-two keeps the number an algorithm measurement.
        # -- batch route: Table.write --------------------------------- #
        batch_secs = None
        for i in range(2):
            t = Table.create(spark, ohlcv_schema(f"agg1d_bench_{i}"),
                             home=os.path.join(home, f"b{i}"))
            t0 = time.time()
            t.write(src)
            dt = time.time() - t0
            batch_secs = dt if batch_secs is None else min(batch_secs, dt)

        # -- streaming route: checkpointed availableNow file sink ----- #
        # (skipped in --batch-only mode: the environment canary needs a
        # fast fixed workload, and its pinned clean band is batch-route)
        if batch_only:
            return {
                "metric": "write_throughput",
                "unit": "rows_per_sec",
                "batch_write": int(n_rows / batch_secs),
                "stream_sink": None,
                "rows": n_rows,
            }
        stage = os.path.join(home, "stage")
        src.write.mode("overwrite").parquet(stage)  # file source input
        ts_schema = spark.read.parquet(stage).schema
        stream_secs = None
        for i in range(2):
            sink = os.path.join(home, f"stream_sink_{i}")
            t0 = time.time()
            q = stream_writer(
                spark.readStream.schema(ts_schema).parquet(stage),
                os.path.join(sink, "parquet"), os.path.join(sink, "ckpt"),
                partition_by=PartitionBy.DAY)
            q.awaitTermination()
            dt = time.time() - t0
            stream_secs = dt if stream_secs is None else min(stream_secs, dt)
    finally:
        src.unpersist()
        shutil.rmtree(home, ignore_errors=True)

    return {
        "metric": "write_throughput",
        "unit": "rows_per_sec",
        "batch_write": int(n_rows / batch_secs),
        "stream_sink": int(n_rows / stream_secs),
        "rows": n_rows,
    }


def main() -> int:
    from zdb_spark.session import get_spark

    n_rows = int(os.environ.get("SPARK_GRAFT_WRITE_ROWS", 2_000_000))
    batch_only = "--batch-only" in sys.argv[1:]
    spark = get_spark("zdb-spark-bench-write")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(measure_write_throughput(spark, n_rows,
                                              batch_only=batch_only)))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
