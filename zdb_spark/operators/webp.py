"""Lossless WebP (VP8L) — a REAL stdlib-only codec, joining the
PNG/GIF/WAV/BMP/TIFF/JPEG real-codec family (round-14 verdict task 7:
crawls carry more WebP than TIFF and BMP combined, and the container
probe alone cannot feed image features).

Implements the complete VP8L bitstream (RFC 9649 §3, the "WebP
Lossless Bitstream Specification"):

- LSB-first bit reading; canonical prefix (Huffman) codes in both the
  "simple" (1-2 symbol) and normal (code-length-coded, with 16/17/18
  repeat codes and the optional max-symbol cutoff) forms;
- the spatially-coded image: optional color cache (hash
  ``0x1e35a7bd * argb >> (32 - cache_bits)``, updated on EVERY emitted
  pixel), optional meta-prefix entropy image (per-block prefix-code
  groups), LZ77 backward references with the 120-entry 2-D distance
  map, and entropy-coded sub-images (entropy / predictor / color
  transform images, palettes);
- all four transforms, inverted in reverse stream order: PREDICTOR
  (14 modes incl. Select and the clamped add/subtract pair, linear
  top-right addressing), COLOR (signed-8-bit cross-channel deltas,
  ``>> 5``), SUBTRACT_GREEN, and COLOR_INDEXING (palette, incl. the
  sub-byte bundling that shrinks the coded width).

Lossy VP8 stays a LOUD refusal (a DCT/bool-coder project with no
overlap with this bitstream); VP8X containers are walked and their
VP8L payload decoded when present.

The encoder half (``vp8l_encode_pixels``) exists for the same reason
``png_encode_pixels`` does: closed-form fixtures.  It writes literal
pixels under flat 8-bit codes (optionally behind SUBTRACT_GREEN), and
its building blocks (``_BitWriter``, ``_write_huffman``) are public
enough for tests to hand-craft cache/LZ77/palette streams that the
fixture path doesn't reach.

No counterpart in the reference engine (clickingbuttons/zdb stores
ticks, not images); the format knowledge is RFC 9649 + the public
libwebp behavior it normatively describes.
"""

from __future__ import annotations

__all__ = ["vp8l_decode", "vp8l_encode_pixels", "webp_decode",
           "webp_decode_pixels", "webp_encode_pixels"]

# Code-length alphabet read order (RFC 9649 §3.7.2.2)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
             11, 12, 13, 14, 15]

# 2-D distance mapping for LZ77 distance codes 1..120 (RFC 9649
# §3.6.2.3): (dx, dy) neighbor offsets, dist = dy * xsize + dx.
# Transcribed VERBATIM from the spec's printed table (the same
# 120 entries as libwebp's kCodeToPlaneCodes bytes, each byte
# (dy << 4) | (8 - dx)); codes 1 and 2 land on "pixel above" and
# "previous pixel" as the spec requires.
_DIST_MAP_SPEC = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]
# Cross-check: the spec table is exactly the (dx, dy) candidates the
# one-byte packing can express — dx in [-7, 8], dy in [0, 7], dy==0
# limited to dx >= 1 (8 + 7*16 = 120 offsets) — ordered by squared
# euclidean distance with ties broken larger-dy-first then
# positive-dx-first.  Regenerating from that key and asserting ALL
# 120 entries equal guards both a transcription typo here and any
# future "simplification" of the ordering rule.
_DIST_MAP = sorted(
    [(x, y) for y in range(8) for x in range(-7, 9)
     if y > 0 or x > 0],
    key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0))
assert _DIST_MAP == _DIST_MAP_SPEC

# Transform types (§3.4)
_PREDICTOR, _COLOR, _SUBTRACT_GREEN, _COLOR_INDEXING = 0, 1, 2, 3


# ---------------------------------------------------------------------- #
# bit I/O                                                                  #
# ---------------------------------------------------------------------- #
class _BitReader:
    """LSB-first bit reader (§3.1): bit i of the stream is bit
    ``pos & 7`` of byte ``pos >> 3``; multi-bit reads fill from the
    low bit up."""

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0
        self.end = len(data) * 8

    def bit(self) -> int:
        if self.pos >= self.end:
            raise ValueError("vp8l: bitstream truncated")
        b = (self.d[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v


class _BitWriter:
    """LSB-first bit writer, the encoder-side mirror of _BitReader."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        for i in range(n):
            if self.nbits % 8 == 0:
                self.buf.append(0)
            if (val >> i) & 1:
                self.buf[-1] |= 1 << (self.nbits % 8)
            self.nbits += 1

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes are emitted MSB-of-code first (§3.7.1: the
        decoder appends each next stream bit as the code's new low
        bit)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        return bytes(self.buf)


# ---------------------------------------------------------------------- #
# canonical prefix codes                                                   #
# ---------------------------------------------------------------------- #
class _Huffman:
    """Canonical prefix-code decoder.  ``trivial`` (single-symbol)
    codes consume ZERO bits per use — the spec's degenerate case, which
    both the simple form and a one-nonzero-length normal form produce."""

    def __init__(self, lengths: list[int]) -> None:
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("vp8l: prefix code with no symbols")
        if len(nz) == 1:
            self.trivial: int | None = nz[0][1]
            self.table: dict[tuple[int, int], int] = {}
            return
        self.trivial = None
        # Kraft completeness: an over- or under-subscribed code is a
        # corrupt stream, refused loudly (libwebp does the same).
        kraft = sum(1 / (1 << ln) for ln, _ in nz)
        if abs(kraft - 1.0) > 1e-12:
            raise ValueError(f"vp8l: invalid prefix code (Kraft sum "
                             f"{kraft!r})")
        self.table = {}
        code = 0
        prev_len = None
        for ln, sym in sorted(nz):
            if prev_len is not None:
                code <<= (ln - prev_len)
            self.table[(ln, code)] = sym
            code += 1
            prev_len = ln

    def read(self, br: _BitReader) -> int:
        if self.trivial is not None:
            return self.trivial
        code, ln = 0, 0
        while True:
            code = (code << 1) | br.bit()
            ln += 1
            if (ln, code) in self.table:
                return self.table[(ln, code)]
            if ln > 15:
                raise ValueError("vp8l: prefix code read past 15 bits")


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for the encoder, canonical order."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = None
    for ln, sym in sorted((ln, s) for s, ln in enumerate(lengths)
                          if ln > 0):
        if prev_len is not None:
            code <<= (ln - prev_len)
        out[sym] = (code, ln)
        code += 1
        prev_len = ln
    return out


def _read_code_lengths(br: _BitReader, alphabet: int) -> list[int]:
    """Normal-form prefix code: code-length code + 16/17/18 repeats
    (§3.7.2.2)."""
    num_cl = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl = _Huffman(cl_lengths)

    if br.bit():                                  # explicit token count
        length_nbits = 2 + 2 * br.bits(3)
        max_tokens = 2 + br.bits(length_nbits)
    else:
        max_tokens = alphabet

    lengths = [0] * alphabet
    prev = 8
    sym = 0
    while sym < alphabet:
        if max_tokens <= 0:
            break
        max_tokens -= 1
        t = cl.read(br)
        if t < 16:
            lengths[sym] = t
            sym += 1
            if t:
                prev = t
        elif t == 16:
            rep = 3 + br.bits(2)
            if sym + rep > alphabet:
                raise ValueError("vp8l: code-length repeat overflow")
            for _ in range(rep):
                lengths[sym] = prev
                sym += 1
        elif t == 17:
            rep = 3 + br.bits(3)
            if sym + rep > alphabet:
                raise ValueError("vp8l: code-length zero-run overflow")
            sym += rep
        else:                                      # t == 18
            rep = 11 + br.bits(7)
            if sym + rep > alphabet:
                raise ValueError("vp8l: code-length zero-run overflow")
            sym += rep
    return lengths


def _read_huffman(br: _BitReader, alphabet: int) -> _Huffman:
    """One prefix code, simple or normal form (§3.7.2)."""
    if br.bit():                                   # simple form
        num_symbols = br.bit() + 1
        if br.bit():                               # first symbol 8 bits
            sym0 = br.bits(8)
        else:
            sym0 = br.bits(1)
        lengths = [0] * alphabet
        if sym0 >= alphabet:
            raise ValueError("vp8l: simple-code symbol out of range")
        if num_symbols == 1:
            lengths[sym0] = 1                      # trivial: 0-bit use
        else:
            sym1 = br.bits(8)
            if sym1 >= alphabet or sym1 == sym0:
                raise ValueError("vp8l: bad simple-code second symbol")
            lengths[sym0] = lengths[sym1] = 1
        return _Huffman(lengths)
    return _Huffman(_read_code_lengths(br, alphabet))


# ---------------------------------------------------------------------- #
# LZ77 helpers                                                             #
# ---------------------------------------------------------------------- #
def _prefix_value(br: _BitReader, code: int) -> int:
    """Length/distance prefix decoding (§3.6.2.2): codes 0-3 are the
    values 1-4; above that, ``(code - 2) >> 1`` extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _plane_code_to_distance(xsize: int, dist_code: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


def _cache_hash(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


# ---------------------------------------------------------------------- #
# spatially-coded / entropy-coded image decoding                           #
# ---------------------------------------------------------------------- #
def _read_huffman_group(br: _BitReader, cache_size: int) -> list[_Huffman]:
    """The 5 prefix codes of one group: green+length+cache, red, blue,
    alpha, distance (§3.7.1)."""
    return [
        _read_huffman(br, 256 + 24 + cache_size),
        _read_huffman(br, 256),
        _read_huffman(br, 256),
        _read_huffman(br, 256),
        _read_huffman(br, 40),
    ]


def _decode_pixels(br: _BitReader, w: int, h: int, *,
                   level0: bool) -> list[int]:
    """Decode one (sub-)image's ARGB pixel array: optional color cache,
    optional meta-prefix groups (level 0 only), literals, LZ77 refs,
    and cache refs (§3.5-3.7)."""
    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"vp8l: color cache bits {cache_bits} "
                             "out of range 1..11")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta: list[int] | None = None
    meta_bits = 0
    meta_w = 0
    n_groups = 1
    if level0 and br.bit():                        # meta prefix codes
        meta_bits = br.bits(3) + 2
        meta_w = (w + (1 << meta_bits) - 1) >> meta_bits
        meta_h = (h + (1 << meta_bits) - 1) >> meta_bits
        meta = _decode_pixels(br, meta_w, meta_h, level0=False)
        n_groups = max((((p >> 8) & 0xFFFF) for p in meta),
                       default=0) + 1

    groups = [_read_huffman_group(br, cache_size)
              for _ in range(n_groups)]

    n = w * h
    out: list[int] = [0] * n
    pos = 0
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            mp = meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]
            g = groups[(mp >> 8) & 0xFFFF]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:                                # literal
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache_size:
                cache[_cache_hash(px, cache_bits)] = px
            pos += 1
        elif s < 256 + 24:                         # LZ77 backward ref
            length = _prefix_value(br, s - 256)
            dist_code = _prefix_value(br, g[4].read(br))
            dist = _plane_code_to_distance(w, dist_code)
            if dist > pos:
                raise ValueError("vp8l: LZ77 distance before start")
            if pos + length > n:
                raise ValueError("vp8l: LZ77 length past image end")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                if cache_size:
                    cache[_cache_hash(px, cache_bits)] = px
                pos += 1
        else:                                      # color-cache ref
            idx = s - 256 - 24
            if idx >= cache_size:
                raise ValueError("vp8l: cache index out of range")
            px = cache[idx]
            out[pos] = px
            # re-inserting is a no-op at the same slot, but the spec
            # says every emitted pixel updates the cache — keep literal
            cache[_cache_hash(px, cache_bits)] = px
            pos += 1
    return out


# ---------------------------------------------------------------------- #
# transforms (§3.4), inverse direction                                     #
# ---------------------------------------------------------------------- #
def _avg2(a: int, b: int) -> int:
    return (((a >> 24) + (b >> 24)) >> 1) << 24 \
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16 \
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8 \
        | ((a & 0xFF) + (b & 0xFF)) >> 1


def _clip255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(t: int, l: int, tl: int) -> int:  # noqa: E741 (spec names)
    diff = 0
    for sh in (24, 16, 8, 0):
        lc = (l >> sh) & 0xFF
        tc = (t >> sh) & 0xFF
        tlc = (tl >> sh) & 0xFF
        diff += abs(lc - tlc) - abs(tc - tlc)
    return t if diff <= 0 else l


def _cas_full(l: int, t: int, tl: int) -> int:  # noqa: E741
    px = 0
    for sh in (24, 16, 8, 0):
        v = _clip255(((l >> sh) & 0xFF) + ((t >> sh) & 0xFF)
                     - ((tl >> sh) & 0xFF))
        px |= v << sh
    return px


def _cas_half(l: int, t: int, tl: int) -> int:  # noqa: E741
    px = 0
    for sh in (24, 16, 8, 0):
        a = (((l >> sh) & 0xFF) + ((t >> sh) & 0xFF)) >> 1
        d = a - ((tl >> sh) & 0xFF)
        # C-style truncation toward zero (libwebp: `(a - b) / 2`)
        half = d // 2 if d >= 0 else -((-d) // 2)
        px |= _clip255(a + half) << sh
    return px


def _add_pixels(a: int, b: int) -> int:
    """Per-channel modular addition (residual + prediction)."""
    return ((((a >> 24) + (b >> 24)) & 0xFF) << 24
            | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF) & 0xFF) << 16)
            | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF) & 0xFF) << 8)
            | (((a & 0xFF) + (b & 0xFF)) & 0xFF))


def _inv_predictor(pix: list[int], w: int, h: int, bits: int,
                   modes: list[int]) -> None:
    sub_w = (w + (1 << bits) - 1) >> bits
    for i in range(w * h):
        x, y = i % w, i // w
        if x == 0 and y == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = pix[i - 1]                      # L
        elif x == 0:
            pred = pix[i - w]                      # T
        else:
            mode = (modes[(y >> bits) * sub_w + (x >> bits)] >> 8) & 0xFF
            l = pix[i - 1]                         # noqa: E741
            t = pix[i - w]
            tl = pix[i - w - 1]
            # linear addressing: at the right edge TR wraps to the
            # CURRENT row's first pixel — spec-mandated (§3.4.1)
            tr = pix[i - w + 1]
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = l
            elif mode == 2:
                pred = t
            elif mode == 3:
                pred = tr
            elif mode == 4:
                pred = tl
            elif mode == 5:
                pred = _avg2(_avg2(l, tr), t)
            elif mode == 6:
                pred = _avg2(l, tl)
            elif mode == 7:
                pred = _avg2(l, t)
            elif mode == 8:
                pred = _avg2(tl, t)
            elif mode == 9:
                pred = _avg2(t, tr)
            elif mode == 10:
                pred = _avg2(_avg2(l, tl), _avg2(t, tr))
            elif mode == 11:
                pred = _select(t, l, tl)
            elif mode == 12:
                pred = _cas_full(l, t, tl)
            elif mode == 13:
                pred = _cas_half(l, t, tl)
            else:
                raise ValueError(f"vp8l: predictor mode {mode} > 13")
        pix[i] = _add_pixels(pix[i], pred)


def _ct_delta(t: int, c: int) -> int:
    """Color-transform delta: SIGNED 8-bit multiply then arithmetic
    shift right 5 (§3.4.2)."""
    st = t - 256 if t >= 128 else t
    sc = c - 256 if c >= 128 else c
    return (st * sc) >> 5


def _inv_color_transform(pix: list[int], w: int, h: int, bits: int,
                         elems: list[int]) -> None:
    sub_w = (w + (1 << bits) - 1) >> bits
    for i in range(w * h):
        x, y = i % w, i // w
        cte = elems[(y >> bits) * sub_w + (x >> bits)]
        g2r = cte & 0xFF                           # blue channel
        g2b = (cte >> 8) & 0xFF                    # green channel
        r2b = (cte >> 16) & 0xFF                   # red channel
        px = pix[i]
        green = (px >> 8) & 0xFF
        red = (px >> 16) & 0xFF
        blue = px & 0xFF
        red = (red + _ct_delta(g2r, green)) & 0xFF
        blue = (blue + _ct_delta(g2b, green)) & 0xFF
        blue = (blue + _ct_delta(r2b, red)) & 0xFF
        pix[i] = (px & 0xFF00FF00) | (red << 16) | blue


def _inv_subtract_green(pix: list[int]) -> None:
    for i, px in enumerate(pix):
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) + g) & 0xFF
        b = ((px & 0xFF) + g) & 0xFF
        pix[i] = (px & 0xFF00FF00) | (r << 16) | b


def _palette_width_bits(n_colors: int) -> int:
    if n_colors <= 2:
        return 3                                   # 8 px / byte (1 bit)
    if n_colors <= 4:
        return 2                                   # 4 px / byte (2 bit)
    if n_colors <= 16:
        return 1                                   # 2 px / byte (4 bit)
    return 0


def _inv_color_indexing(pix: list[int], w: int, h: int,
                        palette: list[int]) -> list[int]:
    wbits = _palette_width_bits(len(palette))
    if wbits == 0:
        out = []
        for px in pix:
            idx = (px >> 8) & 0xFF
            if idx >= len(palette):
                raise ValueError("vp8l: palette index out of range")
            out.append(palette[idx])
        return out
    packed_w = (w + (1 << wbits) - 1) >> wbits
    bpp = 8 >> wbits                               # bits per index
    mask = (1 << wbits) - 1
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            packed = pix[y * packed_w + (x >> wbits)]
            idx = ((packed >> 8) & 0xFF) >> ((x & mask) * bpp)
            idx &= (1 << bpp) - 1
            if idx >= len(palette):
                raise ValueError("vp8l: palette index out of range")
            out[y * w + x] = palette[idx]
    return out


# ---------------------------------------------------------------------- #
# top-level decode                                                         #
# ---------------------------------------------------------------------- #
def vp8l_decode(data: bytes) -> tuple[int, int, list[int]]:
    """Decode one VP8L chunk payload (starting at the 0x2f signature
    byte) to (width, height, ARGB pixel list, row-major)."""
    if not data or data[0] != 0x2F:
        raise ValueError("vp8l: missing signature byte 0x2f")
    br = _BitReader(data[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()                                       # alpha-is-used hint
    version = br.bits(3)
    if version != 0:
        raise ValueError(f"vp8l: version {version} != 0")

    # transforms, in stream order; each records the xsize in effect at
    # its parse position (color-indexing bundling shrinks it)
    cur_w = w
    transforms: list[tuple[int, object]] = []
    seen: set[int] = set()
    while br.bit():
        ttype = br.bits(2)
        if ttype in seen:
            raise ValueError(f"vp8l: duplicate transform {ttype}")
        seen.add(ttype)
        if ttype in (_PREDICTOR, _COLOR):
            bits = br.bits(3) + 2
            sub_w = (cur_w + (1 << bits) - 1) >> bits
            sub_h = (h + (1 << bits) - 1) >> bits
            sub = _decode_pixels(br, sub_w, sub_h, level0=False)
            transforms.append((ttype, (cur_w, bits, sub)))
        elif ttype == _SUBTRACT_GREEN:
            transforms.append((ttype, None))
        else:                                      # COLOR_INDEXING
            n_colors = br.bits(8) + 1
            raw = _decode_pixels(br, n_colors, 1, level0=False)
            palette = []
            prev = 0
            for p in raw:                          # per-channel deltas
                prev = _add_pixels(p, prev)
                palette.append(prev)
            transforms.append((ttype, (cur_w, palette)))
            wbits = _palette_width_bits(n_colors)
            cur_w = (cur_w + (1 << wbits) - 1) >> wbits

    pix = _decode_pixels(br, cur_w, h, level0=True)

    for ttype, arg in reversed(transforms):
        if ttype == _COLOR_INDEXING:
            full_w, palette = arg  # type: ignore[misc]
            pix = _inv_color_indexing(pix, full_w, h, palette)
        elif ttype == _SUBTRACT_GREEN:
            _inv_subtract_green(pix)
        elif ttype == _COLOR:
            tw, bits, sub = arg  # type: ignore[misc]
            _inv_color_transform(pix, tw, h, bits, sub)
        else:                                      # PREDICTOR
            tw, bits, sub = arg  # type: ignore[misc]
            _inv_predictor(pix, tw, h, bits, sub)
    return w, h, pix


def _riff_chunks(payload: bytes):
    """Walk RIFF sub-chunks after the 12-byte header."""
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError("webp: truncated RIFF chunk")
        yield fourcc, body
        pos += 8 + size + (size & 1)               # chunks pad to even


def webp_decode_pixels(payload: bytes) -> tuple[int, int, list[int]]:
    """Full pixel decode of a lossless WebP file: (w, h, ARGB list).
    VP8X containers are walked to their VP8L chunk; lossy VP8 refuses
    LOUDLY (a separate codec, out of scope by design — the same
    contract as mp4/webm pixel decode)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (bad RIFF/WEBP header)")
    for fourcc, body in _riff_chunks(payload):
        if fourcc == b"VP8L":
            return vp8l_decode(body)
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "webp: lossy VP8 pixel decode is not implemented "
                "(boolean-coder/DCT codec); VP8L (lossless) decodes "
                "for real — use webp_probe for lossy triage")
        # VP8X/ALPH/ANIM/EXIF/...: keep walking for a VP8L chunk
    raise ValueError("webp: no VP8L chunk found")


def webp_decode(payload: bytes) -> tuple[str, int, int, int, float]:
    """decode_images-contract decode: ('webp', w, h, 4, mean_luma),
    Rec.601 luma over exact integer channel sums like png_decode —
    closed-form oracle-reproducible."""
    w, h, pix = webp_decode_pixels(payload)
    n = w * h
    sr = sg = sb = 0
    for px in pix:
        sr += (px >> 16) & 0xFF
        sg += (px >> 8) & 0xFF
        sb += px & 0xFF
    luma = (0.299 * (sr / n) + 0.587 * (sg / n)
            + 0.114 * (sb / n)) / 255.0
    return ("webp", w, h, 4, round(luma, 6))


# ---------------------------------------------------------------------- #
# encoder (fixture writer)                                                 #
# ---------------------------------------------------------------------- #
def _rle_tokens(lengths: list[int]):
    """Code-length token stream: literals + 16 (repeat-prev) +
    17/18 (zero runs) — the encoder-side mirror of
    _read_code_lengths."""
    i, n = 0, len(lengths)
    while i < n:
        v = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == v:
            run += 1
        i += run
        if v == 0:
            while run >= 11:
                r = min(run, 138)
                yield (18, r - 11, 7)
                run -= r
            while run >= 3:
                r = min(run, 10)
                yield (17, r - 3, 3)
                run -= r
            for _ in range(run):
                yield (0, None, 0)
            continue
        # nonzero: one literal first (sets the decoder's prev — emitted
        # even when it matches the initial prev=8, so every stream has
        # >= 2 distinct CL tokens and the CL code is never trivial),
        # then repeat-16 tokens
        yield (v, None, 0)
        rem = run - 1
        while rem >= 3:
            r = min(rem, 6)
            yield (16, r - 3, 2)
            rem -= r
        for _ in range(rem):
            yield (v, None, 0)


def _write_code_lengths(bw: _BitWriter, lengths: list[int]) -> None:
    toks = list(_rle_tokens(lengths))
    freq: dict[int, int] = {}
    for t, _, _ in toks:
        freq[t] = freq.get(t, 0) + 1
    if len(freq) < 2:
        raise ValueError("encoder: need >= 2 distinct code-length "
                         "tokens (a trivial CL code cannot terminate)")
    # flat CL code: ceil(log2(k)) bits each, padded to completeness by
    # splitting the last codes one bit deeper when k is not a power of 2
    cl_lengths = _flat_complete_lengths(sorted(freq), 19)
    num_cl = max(_CL_ORDER.index(s) for s, ln in enumerate(cl_lengths)
                 if ln > 0) + 1
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)                                 # no max-token cutoff
    codes = _canonical_codes(cl_lengths)
    for t, extra, nbits in toks:
        c, ln = codes[t]
        bw.write_code(c, ln)
        if nbits:
            bw.write(extra, nbits)


def _flat_complete_lengths(symbols: list[int], alphabet: int) -> list[int]:
    """Canonical length assignment over ``symbols`` that is Kraft-
    complete: k symbols get depth ceil(log2 k), with 2^d - k of them
    promoted one level up (a standard complete binary tree shape)."""
    import math

    k = len(symbols)
    lengths = [0] * alphabet
    if k == 1:
        lengths[symbols[0]] = 1
        return lengths
    d = math.ceil(math.log2(k))
    shallow = (1 << d) - k                         # symbols at depth d-1
    for i, s in enumerate(sorted(symbols)):
        lengths[s] = d - 1 if i < shallow else d
    return lengths


def _write_huffman(bw: _BitWriter, lengths: list[int]) -> None:
    """Normal-form prefix code header for ``lengths``."""
    bw.write(0, 1)                                 # not simple
    _write_code_lengths(bw, lengths)


def _write_simple(bw: _BitWriter, symbols: list[int]) -> None:
    """Simple-form prefix code: 1 or 2 symbols."""
    bw.write(1, 1)
    bw.write(len(symbols) - 1, 1)
    if symbols[0] > 1:
        bw.write(1, 1)
        bw.write(symbols[0], 8)
    else:
        bw.write(0, 1)
        bw.write(symbols[0], 1)
    if len(symbols) == 2:
        bw.write(symbols[1], 8)


_FLAT8 = [8] * 256


def vp8l_encode_pixels(width: int, height: int, argb: list[int], *,
                       subtract_green: bool = False) -> bytes:
    """Encode ARGB pixels as a spec-conformant VP8L chunk payload:
    literal-only (no LZ77/cache), flat 8-bit codes per channel,
    optionally behind a SUBTRACT_GREEN transform.  Bit-deterministic —
    the fixture-writer contract (png_encode_pixels' slot)."""
    if len(argb) != width * height:
        raise ValueError("pixel count != width * height")
    if not (1 <= width <= 1 << 14 and 1 <= height <= 1 << 14):
        raise ValueError("vp8l dims out of the 14-bit range")
    bw = _BitWriter()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if any((p >> 24) & 0xFF != 0xFF for p in argb) else 0, 1)
    bw.write(0, 3)                                 # version
    px = list(argb)
    if subtract_green:
        bw.write(1, 1)
        bw.write(_SUBTRACT_GREEN, 2)
        for i, p in enumerate(px):
            g = (p >> 8) & 0xFF
            r = (((p >> 16) & 0xFF) - g) & 0xFF
            b = ((p & 0xFF) - g) & 0xFF
            px[i] = (p & 0xFF00FF00) | (r << 16) | b
    bw.write(0, 1)                                 # end of transforms
    bw.write(0, 1)                                 # no color cache
    bw.write(0, 1)                                 # no meta prefix codes
    _write_huffman(bw, _FLAT8 + [0] * 24)          # green (280)
    _write_huffman(bw, _FLAT8)                     # red
    _write_huffman(bw, _FLAT8)                     # blue
    _write_huffman(bw, _FLAT8)                     # alpha
    _write_simple(bw, [0])                         # distance (unused)
    for p in px:
        bw.write_code((p >> 8) & 0xFF, 8)          # green
        bw.write_code((p >> 16) & 0xFF, 8)         # red
        bw.write_code(p & 0xFF, 8)                 # blue
        bw.write_code((p >> 24) & 0xFF, 8)         # alpha
    return b"\x2f" + bw.bytes()


def _riff_wrap(vp8l_payload: bytes) -> bytes:
    chunk = b"VP8L" + len(vp8l_payload).to_bytes(4, "little") \
        + vp8l_payload
    if len(vp8l_payload) & 1:
        chunk += b"\x00"
    return (b"RIFF" + (4 + len(chunk)).to_bytes(4, "little")
            + b"WEBP" + chunk)


def webp_encode_pixels(width: int, height: int, argb: list[int], *,
                       subtract_green: bool = False) -> bytes:
    """Full lossless-WebP file for the given ARGB pixels."""
    return _riff_wrap(vp8l_encode_pixels(width, height, argb,
                                         subtract_green=subtract_green))
