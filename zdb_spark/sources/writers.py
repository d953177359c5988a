"""Sink connectors: get Table/DataFrame data OUT, shaped for training.

The reference has no export path at all (its one consumer is the HTTP
API); a training-data engine needs the opposite end of the pipeline too:
deterministic, resumable, shard-addressed exports that a dataloader
fleet can consume without coordination.  ``export_shards`` is that sink:

- Shard assignment is ``md5(salt:id) % 10000 % n_shards`` — the exact
  recipe every curation operator here uses (`operators/curation.py:
  _hash_bucket`), so it is reproducible in ANY engine with md5 (the
  DuckDB gate oracle recomputes it closed-form) and stable across runs,
  Spark versions, and cluster sizes.  Ingest order never leaks into
  shard membership.
- One ``repartition(shard)`` shuffle co-locates each shard, then a
  single ``partitionBy("shard")`` write emits ``shard=K/`` directories —
  at 100 TB that is the layout object stores and dataloaders want
  (list one prefix per worker), and the shuffle is the only network
  pass.
- ``fmt="jsonl"`` uses Spark's json writer (one JSON object per line —
  the lingua franca of LLM training corpora); parquet/csv pass through.
- A ``_manifest.json`` records n_shards/fmt/salt/row counts so a
  consumer can checksum completeness without listing files.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F

from ..operators.curation import _BUCKETS, _hash_bucket

__all__ = ["export_shards"]

_FMT_WRITERS = {"jsonl": "json", "json": "json", "parquet": "parquet",
                "csv": "csv"}


def export_shards(df: DataFrame, path: str, n_shards: int, id_col: str,
                  fmt: str = "jsonl", salt: str = "v1",
                  mode: str = "errorifexists") -> dict:
    """Write ``df`` as ``n_shards`` deterministic hash shards under
    ``path/shard=K/`` and return a manifest dict (also persisted as
    ``path/_manifest.json``).

    Returns ``{"n_shards", "fmt", "salt", "rows", "per_shard": {k: n}}``.
    Empty shards are legal (small inputs) and appear with count 0 in the
    manifest, so consumers can distinguish "empty" from "missing".
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if fmt not in _FMT_WRITERS:
        raise ValueError(f"unknown fmt {fmt!r} "
                         f"(one of {sorted(_FMT_WRITERS)})")
    if n_shards > _BUCKETS:
        raise ValueError(f"n_shards must be <= {_BUCKETS} "
                         "(the hash-bucket domain)")
    if "shard" in df.columns:
        raise ValueError(
            "input already has a 'shard' column — rename it before "
            "export (the shard partition column would be ambiguous)")

    shard = (_hash_bucket(id_col, salt) % F.lit(n_shards)).alias("shard")
    # Persist the sharded frame across its two consumers (the manifest
    # count and the write): one source scan + hash pass instead of two,
    # and both jobs see the SAME evaluation — without this, a
    # nondeterministic upstream (sample/rand) could produce a manifest
    # asserting counts the written shards don't contain.
    out = df.select("*", shard).persist()
    try:
        counts = {int(r["shard"]): r["n"] for r in
                  out.groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
                     .collect()}
        per_shard = {k: counts.get(k, 0) for k in range(n_shards)}

        (out.repartition(n_shards, "shard")
            .write.mode(mode).partitionBy("shard")
            .format(_FMT_WRITERS[fmt]).save(path))
    finally:
        out.unpersist()

    manifest = {"n_shards": n_shards, "fmt": fmt, "salt": salt,
                "rows": sum(per_shard.values()), "per_shard": per_shard}
    _write_manifest(df.sparkSession, path, json.dumps(manifest))
    return manifest


def _write_manifest(spark, path: str, content: str) -> None:
    """Write ``path/_manifest.json`` through the same filesystem layer
    the data write used: plain open()/os.replace only works for local
    paths, but export targets are routinely object stores (s3a://,
    hdfs://) — where the local call would crash AFTER all shard data
    landed, breaking the manifest-for-completeness contract.  Local
    paths keep the tmp+rename atomicity; remote paths go through the
    Hadoop FileSystem API (rename is atomic on HDFS; on S3 the manifest
    is small enough that the PUT itself is effectively atomic)."""
    if "://" not in path or path.startswith("file://"):
        base = path[len("file://"):] if path.startswith("file://") else path
        tmp = os.path.join(base, "_manifest.json.tmp")
        with open(tmp, "w") as f:
            f.write(content)
        os.replace(tmp, os.path.join(base, "_manifest.json"))
        return
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    dest = jvm.org.apache.hadoop.fs.Path(path + "/_manifest.json")
    fs = dest.getFileSystem(conf)
    out = fs.create(dest, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()
