"""Perceptual image hashing + image near-dedup — the IMAGE leg of the
dedup family, enabled by the from-scratch codecs (a crawl's image
corpus dedups on perceptual fingerprints the way its text dedups on
SimHash/MinHash):

- ``ahash64`` — average hash: 8×8 box-averaged grayscale, bit =
  cell brighter than the image mean.  EXACT-INTEGER arithmetic
  throughout (Rec.601 numerators, cross-multiplied comparisons), so
  the fingerprint is engine-reproducible.
- ``dhash64`` — difference hash: 9×8 grid, bit = right neighbor
  brighter — the standard crop/brightness-robust workhorse; also
  exact-integer.
- ``phash64`` — DCT hash: 32×32 grayscale → orthonormal 2-D DCT-II →
  top-left 8×8 low-frequency block, bit = coefficient above the
  block's median (DC excluded).  Float DCT (numpy), deterministic for
  a given input but not SQL-replayable — gates therefore pin the
  integer hashes and unit tests pin pHash's invariances.
- ``image_hashes`` — the Spark operator: Arrow-batched ``mapInPandas``
  decoding PNG or lossless-WebP blobs (magic-sniffed) to one 64-bit
  fingerprint per row; rows independent, no shuffle.
- ``image_near_dup_pairs`` — hamming-ball pair mining via
  ``dedup.hamming_pairs`` (the SimHash pigeonhole banding: recall
  exactly 1.0, never all-pairs).

No counterpart in the reference engine (a tick store holds no
images); the methods are the public aHash/dHash/pHash family
(Krawetz's "Looks Like It" writeup popularized them) with the DCT
basis shared with the T.81 JPEG codec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["gray_grid", "ahash64", "dhash64", "phash64",
           "image_hashes", "image_near_dup_pairs"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_gray_pixels(payload: bytes):
    """(w, h, luma-numerator list) from a PNG or lossless-WebP blob:
    per pixel the INTEGER Rec.601 numerator 299R + 587G + 114B (or
    1000·grey), so everything downstream of the codec stays in exact
    integer arithmetic.  Other formats raise loudly — decode first
    (decode_images) or extend here."""
    if payload[:8] == _PNG_SIG:
        from .multimodal import _png_pixels

        w, h, _ct, nch, px = _png_pixels(payload)
        out = []
        if nch <= 2:                           # grey / grey+alpha
            for i in range(0, len(px), nch):
                out.append(1000 * px[i])
        else:                                  # RGB / RGBA
            for i in range(0, len(px), nch):
                out.append(299 * px[i] + 587 * px[i + 1]
                           + 114 * px[i + 2])
        return w, h, out
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from .webp import webp_decode_pixels

        w, h, argb = webp_decode_pixels(payload)
        return w, h, [299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF)
                      + 114 * (p & 0xFF) for p in argb]
    raise ValueError(
        f"image hash: unsupported signature {payload[:4]!r} "
        "(PNG and lossless WebP decode here; decode other formats "
        "to pixels first)")


def gray_grid(w: int, h: int, luma: list[int],
              gw: int, gh: int) -> list[tuple[int, int]]:
    """Box-average downsample to a ``gw`` × ``gh`` grid, EXACT: each
    cell is ``(sum of luma numerators, pixel count)`` over its box
    (``[i*h//gh, (i+1)*h//gh)`` × the column analog), so comparisons
    between cells cross-multiply instead of dividing.  Images smaller
    than the grid raise (an upsampled hash would compare unlike
    things silently)."""
    if w < gw or h < gh:
        raise ValueError(f"image {w}x{h} smaller than the {gw}x{gh} "
                         "hash grid")
    cells = []
    for gy in range(gh):
        y0, y1 = gy * h // gh, (gy + 1) * h // gh
        for gx in range(gw):
            x0, x1 = gx * w // gw, (gx + 1) * w // gw
            s = 0
            for y in range(y0, y1):
                row = y * w
                for x in range(x0, x1):
                    s += luma[row + x]
            cells.append((s, (y1 - y0) * (x1 - x0)))
    return cells


def _bits_to_u64(bits: list[int]) -> int:
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v


def ahash64(payload: bytes) -> int:
    """Average hash: bit i = (8×8 cell i brighter than the global
    mean), exact-integer (cell_sum * total_count > total_sum *
    cell_count)."""
    w, h, luma = _decode_gray_pixels(payload)
    cells = gray_grid(w, h, luma, 8, 8)
    total_s = sum(s for s, _ in cells)
    total_n = sum(n for _, n in cells)
    return _bits_to_u64([int(s * total_n > total_s * n)
                         for s, n in cells])


def dhash64(payload: bytes) -> int:
    """Difference hash: 9×8 grid, bit (r, c) = cell (r, c+1) brighter
    than cell (r, c) — 64 exact-integer gradient comparisons."""
    w, h, luma = _decode_gray_pixels(payload)
    cells = gray_grid(w, h, luma, 9, 8)
    bits = []
    for r in range(8):
        for c in range(8):
            sl, nl = cells[r * 9 + c]
            sr, nr = cells[r * 9 + c + 1]
            bits.append(int(sr * nl > sl * nr))
    return _bits_to_u64(bits)


def phash64(payload: bytes) -> int:
    """DCT hash: 32×32 grayscale → orthonormal 2-D DCT-II → the
    top-left 8×8 block; bit = coefficient strictly above the median of
    the 63 AC coefficients (DC excluded — it is the mean the hash must
    be invariant to)."""
    import numpy as np

    w, h, luma = _decode_gray_pixels(payload)
    cells = gray_grid(w, h, luma, 32, 32)
    g = np.array([s / n for s, n in cells],
                 dtype=np.float64).reshape(32, 32)
    k = np.arange(32).reshape(-1, 1)
    n = np.arange(32).reshape(1, -1)
    basis = np.sqrt(2.0 / 32.0) * np.cos((2 * n + 1) * k * np.pi / 64.0)
    basis[0, :] = np.sqrt(1.0 / 32.0)
    coef = basis @ g @ basis.T
    block = coef[:8, :8].flatten()
    ac = np.delete(block, 0)
    med = float(np.median(ac))
    bits = [0] + [int(v > med) for v in ac]        # DC bit pinned 0
    return _bits_to_u64(bits)


_HASHERS = {"ahash": ahash64, "dhash": dhash64, "phash": phash64}


def image_hashes(df: DataFrame, blob_col: str = "blob",
                 id_col: str = "id", *,
                 method: str = "dhash",
                 on_error: str = "raise") -> DataFrame:
    """One 64-bit perceptual fingerprint per image blob via
    Arrow-batched ``mapInPandas`` (NULL blobs vanish).  Output:
    (id, hash long — bit 63 lands in the sign bit, the SimHash
    convention, so ``dedup.hamming_pairs`` applies unchanged).

    ``on_error`` is the per-row policy for UNDECODABLE payloads
    (lossy VP8, arithmetic JPEG, truncated bytes — anything the
    stdlib codecs loudly refuse), the ADVICE-r15 crawl-corpus fix —
    one bad image must not abort a 100 TB stage:

    - ``"raise"`` (default): propagate, failing the stage — right for
      curated fixtures where an undecodable blob IS the bug;
    - ``"skip"``: drop the row, like NULL blobs — right for raw crawl
      corpora (count skips as ``input minus output`` ids);
    - ``"error"``: keep the row with ``hash`` NULL and the refusal
      message in an ``error`` string column (schema gains ``error``;
      decodable rows carry error NULL).
    """
    import pandas as pd

    if method not in _HASHERS:
        raise ValueError(f"unknown image hash {method!r} "
                         f"({sorted(_HASHERS)})")
    if on_error not in ("raise", "skip", "error"):
        raise ValueError(f"unknown on_error policy {on_error!r} "
                         f"(raise|skip|error)")
    hasher = _HASHERS[method]
    src = df.select(F.col(id_col).alias("id"),
                    F.col(blob_col).alias("blob"))
    with_err = on_error == "error"
    cols = ["id", "hash"] + (["error"] if with_err else [])

    def mapper(batches):
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf["id"], pdf["blob"]):
                if blob is None:
                    continue
                try:
                    v = hasher(bytes(blob))
                except Exception as exc:  # undecodable payload
                    if on_error == "raise":
                        raise
                    if with_err:
                        rows.append((int(i), None, str(exc)))
                    continue
                signed = v - (1 << 64) if v >= (1 << 63) else v
                rows.append((int(i), signed, None) if with_err
                            else (int(i), signed))
            yield pd.DataFrame(rows, columns=cols)

    schema = "id long, hash long" + (", error string" if with_err
                                     else "")
    return src.mapInPandas(mapper, schema)


def image_near_dup_pairs(df: DataFrame, blob_col: str = "blob",
                         id_col: str = "id", *,
                         method: str = "dhash",
                         max_hamming: int = 6,
                         max_bucket_size: int | None = None,
                         on_error: str = "raise") -> DataFrame:
    """Image near-duplicate pairs: perceptual hash + the SimHash
    pigeonhole banding (``dedup.hamming_pairs`` — complete hamming
    ball, never all-pairs).  Output: (id_a, id_b, hamming).
    ``on_error="skip"`` (see image_hashes) is the crawl-corpus mode:
    undecodable blobs simply produce no pairs."""
    from .dedup import hamming_pairs

    if on_error == "error":
        raise ValueError("image_near_dup_pairs accepts raise|skip "
                         "(an error column has no pair semantics)")
    hashed = image_hashes(df, blob_col, id_col, method=method,
                          on_error=on_error).cache()
    out = hamming_pairs(hashed, "hash", "id", max_hamming=max_hamming,
                        max_bucket_size=max_bucket_size)
    out._zdb_cache_handles = [hashed,
                              *getattr(out, "_zdb_cache_handles", [])]
    return out
