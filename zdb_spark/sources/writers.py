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

__all__ = ["export_shards", "export_tar_shards", "read_tar_shards"]

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


def export_tar_shards(df: DataFrame, path: str, n_shards: int,
                      key_col: str, members: dict[str, str],
                      salt: str = "v1") -> dict:
    """WebDataset-style export: every sample becomes ``{key}.{ext}``
    members inside deterministic hash shards ``shard-%06d.tar`` — the
    tar-of-samples layout multimodal training dataloaders stream
    (public format: Aizman et al.'s WebDataset convention; samples
    grouped by key prefix, shards consumed whole-file-sequentially).

    - ``members`` maps column name → member extension, in a FIXED order
      (dict order = member order per sample): string columns are
      written utf-8, binary columns pass through.
    - Shard assignment is the engine-wide md5 recipe
      (``md5(salt:key) % 10000 % n_shards`` — curation._hash_bucket),
      so any engine with md5 can recompute membership.
    - Determinism: one ``repartition(n_shards, shard)`` shuffle, a
      ``sortWithinPartitions(shard, key)``, then a streaming
      ``mapInPandas`` writer appends members in (key, member-order)
      sequence with pinned tar metadata (mtime 0, uid/gid 0, mode
      0o644) — byte-identical shards for identical input, any cluster.
      Hash partitioning may give one task several whole shards, never
      a shard split across tasks, so each tar has exactly one writer.
    - Memory is O(Arrow batch): samples stream through open handles;
      a shard is never materialized.
    - ``path`` must be a filesystem the executors share (local in
      tests; NFS/fuse on a cluster).  Object-store targets should
      export locally and upload — tar append needs seekable files.

    Returns (and persists as ``_manifest.json``) ``{"n_shards",
    "salt", "rows", "members", "per_shard": {k: n_samples}}``.
    Existing shard files under ``path`` raise — an interrupted export
    must be cleaned, not silently appended to.
    """
    import glob as _glob

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if n_shards > _BUCKETS:
        raise ValueError(f"n_shards must be <= {_BUCKETS}")
    if not members:
        raise ValueError("members must map >= 1 column to an extension")
    os.makedirs(path, exist_ok=True)
    if _glob.glob(os.path.join(path, "shard-*.tar")):
        raise FileExistsError(f"shard files already present under {path}")

    exts = list(members.values())
    cols = list(members.keys())
    shard = (_hash_bucket(key_col, salt) % F.lit(n_shards)).alias("__shard")
    src = (df.select(F.col(key_col).cast("string").alias("__key"),
                     *cols, shard)
             .repartition(n_shards, "__shard")
             .sortWithinPartitions("__shard", "__key"))

    def write_partition(batches):
        import io
        import tarfile

        import pandas as pd
        from pyspark import TaskContext

        # attempt-unique temp names + rename-on-success: a speculative
        # or re-attempted task on shared storage (NFS/S3-fuse) must
        # never interleave writes into the same final tar — attempts
        # write distinct temps, and the deterministic per-shard content
        # makes whichever rename lands last byte-identical anyway
        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else os.getpid()
        handles: dict[int, tarfile.TarFile] = {}
        temps: dict[int, str] = {}
        counts: dict[int, int] = {}
        ok = False
        try:
            for pdf in batches:
                # plain tuples (name=None): itertuples would mangle the
                # dunder-prefixed __key/__shard attribute names
                for row in pdf.itertuples(index=False, name=None):
                    key, vals, k = row[0], row[1:-1], int(row[-1])
                    if k not in handles:
                        temps[k] = os.path.join(
                            path, f"shard-{k:06d}.tar.{attempt}.tmp")
                        handles[k] = tarfile.open(
                            temps[k], "w", format=tarfile.USTAR_FORMAT)
                        counts[k] = 0
                    for val, ext in zip(vals, exts):
                        if val is None:
                            # a silent b"None" member would corrupt
                            # training data while the manifest counts
                            # the sample as valid — fail loudly
                            raise ValueError(
                                f"export_tar_shards: NULL member "
                                f"{ext!r} for key {key!r} — drop or "
                                f"fill NULL rows before export")
                        data = (val if isinstance(val, (bytes, bytearray))
                                else str(val).encode("utf-8"))
                        info = tarfile.TarInfo(name=f"{key}.{ext}")
                        info.size = len(data)
                        info.mtime = 0
                        info.uid = info.gid = 0
                        info.uname = info.gname = ""
                        info.mode = 0o644
                        handles[k].addfile(info, io.BytesIO(bytes(data)))
                    counts[k] += 1
            ok = True
        finally:
            for h in handles.values():
                h.close()
            if ok:
                for k, tmp in temps.items():
                    os.replace(tmp, os.path.join(path,
                                                 f"shard-{k:06d}.tar"))
            else:
                for tmp in temps.values():   # failed attempt: no debris
                    try:
                        os.remove(tmp)
                    except OSError:
                        pass
        yield pd.DataFrame({"shard": list(counts), "n_samples":
                            [counts[k] for k in counts]})

    stats = src.mapInPandas(write_partition,
                            "shard int, n_samples long").collect()
    per_shard = {k: 0 for k in range(n_shards)}
    for r in stats:
        per_shard[int(r["shard"])] = int(r["n_samples"])
    manifest = {"n_shards": n_shards, "salt": salt,
                "rows": sum(per_shard.values()),
                "members": dict(members),
                "per_shard": per_shard}
    _write_manifest(df.sparkSession, path, json.dumps(manifest))
    return manifest


def read_tar_shards(spark, path: str) -> DataFrame:
    """Stream WebDataset shards back as (key, ext, content binary, pos,
    shard) rows — one row per tar member, ``pos`` the member's index in
    its shard (the writer's determinism makes it reproducible).

    Scale shape: the driver lists only shard FILE NAMES (bounded by the
    manifest's n_shards); each executor task opens its shard with
    ``tarfile``'s streaming reader — a sequential read, no whole-shard
    materialization, no binaryFile row holding a GB."""
    import glob as _glob

    names = sorted(os.path.basename(p) for p in
                   _glob.glob(os.path.join(path, "shard-*.tar")))
    if not names:
        raise FileNotFoundError(f"no shard-*.tar under {path}")
    files = spark.createDataFrame([(n,) for n in names], "fname string")

    def read_file(batches):
        import tarfile

        import pandas as pd

        for pdf in batches:
            for fname in pdf["fname"]:
                shard = int(fname[len("shard-"):-len(".tar")])
                rows = []
                with tarfile.open(os.path.join(path, fname), "r|") as tf:
                    pos = 0
                    for info in tf:
                        if not info.isfile():
                            # externally produced tars can carry
                            # directories/symlinks; extractfile()
                            # returns None for those — skip rather
                            # than crash, and don't burn a pos index
                            continue
                        key, _dot, ext = info.name.rpartition(".")
                        rows.append((key, ext,
                                     tf.extractfile(info).read(),
                                     pos, shard))
                        pos += 1
                yield pd.DataFrame(rows, columns=[
                    "key", "ext", "content", "pos", "shard"])

    return (files.repartition(len(names), "fname")
            .mapInPandas(read_file, "key string, ext string, "
                         "content binary, pos int, shard int"))
