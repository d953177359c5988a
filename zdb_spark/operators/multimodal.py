"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched pandas functions.

Design (BASELINE.json north star):
- A multimodal asset is ``(id, modality, blob binary, meta struct)``.
- Metadata extraction that only needs bytes (size, magic sniffing) is
  pure ``pyspark.sql.functions`` — JVM-side, no decode.
- Decode / feature-extract / resize / frame-sample run as ``mapInPandas``
  over Arrow batches: the batch shape (pandas Series of bytes) is the
  unit of vectorization, and output schemas are fixed up front so the
  pipeline is plan-able.
- The actual codec calls are STUBBED: the image/audio libraries are not
  in this container.  ``decoder="fake"`` (default) produces a
  deterministic hash-derived decode so the Spark-side plumbing — schema,
  partitioning, UDF signature, batch shape — is real and testable;
  ``decoder="pil"`` shows where the real import goes and raises
  ``NotImplementedError`` if PIL is absent.

Scale notes: blobs dominate bytes, so the decode stage repartitions by a
size-aware key before ``mapInPandas`` to even out Arrow batch payloads;
metadata-only paths never touch the blob bytes beyond the scan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = ["MAGIC_SIGNATURES", "blob_metadata", "decode_images",
           "sample_frames"]

# (prefix bytes, format name) — standard public file signatures.
MAGIC_SIGNATURES: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),      # wav/avi/webp container
    (b"ID3", "mp3"),
    (b"\x00\x00\x00", "mp4-ish"),
]

_DECODE_SCHEMA = ("id long, fmt string, width int, height int, channels int, "
                  "mean_luma double")


def blob_metadata(df: DataFrame, blob_col: str = "blob",
                  id_col: str = "id") -> DataFrame:
    """JVM-side metadata: byte length + magic-sniffed format.

    No decode, no Python — safe to run over the full corpus as a scan.
    """
    fmt = F.lit("unknown")
    for prefix, name in reversed(MAGIC_SIGNATURES):
        hexlit = prefix.hex()
        fmt = F.when(
            F.hex(F.substring(F.col(blob_col), 1, len(prefix)))
             == F.lit(hexlit.upper()),
            F.lit(name)).otherwise(fmt)
    return df.select(
        F.col(id_col),
        F.octet_length(F.col(blob_col)).alias("byte_len"),
        fmt.alias("sniffed_fmt"))


def _fake_decode(payload: bytes) -> tuple[str, int, int, int, float]:
    """Deterministic stand-in for an image decoder: derives plausible
    dimensions from a sha256 of the payload.  STUB — replace with a real
    codec (PIL/opencv) outside this container.  sha256 specifically so a
    SQL oracle (DuckDB ``sha256``) can reproduce the fake's outputs and
    value-check the whole Arrow-batched plumbing path end to end."""
    h = hashlib.sha256(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    channels = 1 + h[2] % 3
    mean_luma = round(h[3] / 255.0, 6)
    return ("fake", width, height, channels, mean_luma)


def decode_images(df: DataFrame, blob_col: str = "blob", id_col: str = "id",
                  decoder: str = "fake",
                  target_partitions: int | None = None) -> DataFrame:
    """Decode blobs to (fmt, width, height, channels, mean_luma) via
    ``mapInPandas`` over Arrow batches.

    ``decoder="fake"`` is the deterministic stub; ``decoder="pil"`` is the
    real-codec slot (raises NotImplementedError when PIL is missing —
    intentionally, per container constraints).
    """
    if decoder not in ("fake", "pil"):
        raise ValueError(f"unknown decoder {decoder!r}")

    src = df.select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))
    if target_partitions:
        # Spread large blobs: hash-repartition so one Arrow batch doesn't
        # concentrate the biggest payloads.
        src = src.repartition(target_partitions, "id")

    use_pil = decoder == "pil"

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_pil:
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "real image decoding requires PIL, which is not "
                    "installed in this container; use decoder='fake' for "
                    "the plumbing path") from e
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf["id"], pdf["blob"]):
                if use_pil:  # pragma: no cover — real-codec slot
                    raise NotImplementedError("wire PIL decode here")
                fmt, w, h, c, luma = _fake_decode(bytes(payload))
                rows.append((int(i), fmt, w, h, c, luma))
            yield pd.DataFrame(rows, columns=["id", "fmt", "width", "height",
                                              "channels", "mean_luma"])

    return src.mapInPandas(mapper, _DECODE_SCHEMA)


def sample_frames(df: DataFrame, blob_col: str = "blob", id_col: str = "id",
                  every_nth: int = 10, max_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video blobs: emits one row per sampled
    frame index with a deterministic frame fingerprint (STUB decode).

    Output: (id, frame_idx, frame_hash) — the explode-shaped contract a
    real ffmpeg-backed sampler would honor.  The stub fingerprint is
    ``sha256(blob || ':' || frame_idx)[:16]`` so an engine with only
    string sha256 (the DuckDB gate oracle) reproduces it exactly.
    """
    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf["id"], pdf["blob"]):
                data = bytes(payload)
                n_pseudo_frames = max(1, len(data) // 32)
                picked = list(range(0, n_pseudo_frames, every_nth))[:max_frames]
                for fi in picked:
                    fh = hashlib.sha256(
                        data + f":{fi}".encode()).hexdigest()[:16]
                    rows.append((int(i), fi, fh))
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "frame_hash"])

    src = df.select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))
    return src.mapInPandas(mapper, "id long, frame_idx int, frame_hash string")
