"""VP8L (lossless WebP) codec — operators/webp.py.

The encoder half covers the literal path; the decoder-only paths
(LZ77 backward refs with the 2-D distance map, the color cache,
palette color-indexing incl. sub-byte bundling, the predictor and
color transforms, meta prefix-code groups) are exercised by
hand-crafted spec streams built with the module's own bit writer —
the parts a fixture encoder can't reach.
"""

import struct

import pytest

from zdb_spark.operators.webp import (_FLAT8, _BitWriter, _cache_hash,
                                      _write_huffman, _write_simple,
                                      vp8l_decode, vp8l_encode_pixels,
                                      webp_decode, webp_decode_pixels,
                                      webp_encode_pixels)


def _riff(fourcc: bytes, chunk: bytes) -> bytes:
    inner = fourcc + struct.pack("<I", len(chunk)) + chunk
    if len(chunk) & 1:
        inner += b"\x00"
    return (b"RIFF" + struct.pack("<I", 4 + len(inner)) + b"WEBP"
            + inner)


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)                                  # alpha hint
    bw.write(0, 3)                                  # version


def _flat_codes(bw: _BitWriter) -> None:
    """Five flat literal codes (green/red/blue/alpha normal 8-bit,
    distance trivial)."""
    _write_huffman(bw, _FLAT8 + [0] * 24)
    _write_huffman(bw, _FLAT8)
    _write_huffman(bw, _FLAT8)
    _write_huffman(bw, _FLAT8)
    _write_simple(bw, [0])


def _literal(bw: _BitWriter, px: int) -> None:
    """One ARGB literal under the flat codes (code == symbol)."""
    bw.write_code((px >> 8) & 0xFF, 8)              # green
    bw.write_code((px >> 16) & 0xFF, 8)             # red
    bw.write_code(px & 0xFF, 8)                     # blue
    bw.write_code((px >> 24) & 0xFF, 8)             # alpha


class TestRoundTrip:
    def test_gradient_with_alpha(self):
        w, h = 9, 6
        px = [(((100 + x) % 256) << 24) | (((x * 31 + y * 7) % 256) << 16)
              | (((y * 53 + x) % 256) << 8) | ((x * 11 + y * 13) % 256)
              for y in range(h) for x in range(w)]
        blob = webp_encode_pixels(w, h, px)
        assert webp_decode_pixels(blob) == (w, h, px)
        fmt, gw, gh, ch, luma = webp_decode(blob)
        assert (fmt, gw, gh, ch) == ("webp", w, h, 4)
        # Rec.601 over exact channel means
        n = w * h
        sr = sum((p >> 16) & 0xFF for p in px) / n
        sg = sum((p >> 8) & 0xFF for p in px) / n
        sb = sum(p & 0xFF for p in px) / n
        assert luma == round(
            (0.299 * sr + 0.587 * sg + 0.114 * sb) / 255.0, 6)

    def test_subtract_green_and_edge_sizes(self):
        for w, h in [(1, 1), (1, 7), (8, 1), (5, 5)]:
            px = [(0xFF << 24) | (((x * 97 + y * 13) % 256) << 16)
                  | (((x + y * 41) % 256) << 8) | ((x * 3 + y) % 256)
                  for y in range(h) for x in range(w)]
            for sg_flag in (False, True):
                blob = webp_encode_pixels(w, h, px,
                                          subtract_green=sg_flag)
                assert webp_decode_pixels(blob) == (w, h, px), \
                    (w, h, sg_flag)

    def test_deterministic_bytes(self):
        px = [0xFF010203, 0xFF040506, 0xFF070809, 0xFF0A0B0C]
        assert webp_encode_pixels(2, 2, px) == webp_encode_pixels(2, 2,
                                                                  px)


class TestHandCraftedStreams:
    def test_lz77_backward_ref_distance_map(self):
        # 4x4 solid color: 1 literal + one LZ77 (length 15, distance
        # code 2 -> map entry (1,0) -> dist 1).  Green code: simple
        # 2-symbol [g, 256+7]; length prefix 7 -> extra=2, offset=12,
        # value = 12 + extra_bits + 1.
        color = 0xFF204060
        g = (color >> 8) & 0xFF
        bw = _BitWriter()
        _header(bw, 4, 4)
        bw.write(0, 1)                              # no transforms
        bw.write(0, 1)                              # no cache
        bw.write(0, 1)                              # no meta
        # green: NORMAL form {g: 1, 263: 1} — the simple form's 8-bit
        # symbol field cannot name length codes (>= 256)
        g_lengths = [0] * 280
        g_lengths[g] = g_lengths[256 + 7] = 1
        _write_huffman(bw, g_lengths)
        _write_simple(bw, [(color >> 16) & 0xFF])   # red
        _write_simple(bw, [color & 0xFF])           # blue
        _write_simple(bw, [(color >> 24) & 0xFF])   # alpha
        _write_simple(bw, [1])                      # distance: code 1
        # literal pixel: 2-symbol code, canonical order by symbol —
        # g < 256+7 so g gets code 0
        bw.write_code(0, 1)                         # green literal
        # red/blue/alpha are trivial codes: 0 bits each
        bw.write_code(1, 1)                         # green sym 256+7
        bw.write(2, 2)                              # length extra -> 15
        # distance code trivial (0 bits): prefix 1 -> value 2 -> dist 1
        w, h, pix = vp8l_decode(b"\x2f" + bw.bytes())
        assert (w, h) == (4, 4)
        assert pix == [color] * 16

    def test_lz77_row_above_distance(self):
        # distance code 1 -> map entry (0,1) -> dist = xsize: copies
        # the row above.  4x2: 4 literals then length-4 backref
        # (prefix 3 = symbol 259, no extra bits).
        from zdb_spark.operators.webp import (_canonical_codes,
                                              _flat_complete_lengths)

        row = [0xFF010203, 0xFF040506, 0xFF070809, 0xFF0A0B0C]
        greens = sorted({(p >> 8) & 0xFF for p in row}) + [259]
        g_lengths = _flat_complete_lengths(greens, 280)
        g_codes = _canonical_codes(g_lengths)
        bw = _BitWriter()
        _header(bw, 4, 2)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        _write_huffman(bw, g_lengths)
        reds = sorted({(p >> 16) & 0xFF for p in row})
        blues = sorted({p & 0xFF for p in row})
        r_codes = _canonical_codes(_flat_complete_lengths(reds, 256))
        b_codes = _canonical_codes(_flat_complete_lengths(blues, 256))
        _write_huffman(bw, _flat_complete_lengths(reds, 256))
        _write_huffman(bw, _flat_complete_lengths(blues, 256))
        _write_simple(bw, [0xFF])                   # alpha
        _write_simple(bw, [0])                      # dist prefix 0 -> 1
        for px in row:
            bw.write_code(*g_codes[(px >> 8) & 0xFF])
            bw.write_code(*r_codes[(px >> 16) & 0xFF])
            bw.write_code(*b_codes[px & 0xFF])
        bw.write_code(*g_codes[259])                # length 4
        # distance trivial: prefix 0 -> value 1 -> dist_code 1 -> (0,1)
        w, h, pix = vp8l_decode(b"\x2f" + bw.bytes())
        assert (w, h) == (4, 2)
        assert pix == row + row

    def test_lz77_high_distance_codes(self):
        # The tail of the 120-entry distance map (ADVICE r15): map
        # code 120 -> LAST entry (8, 7) -> dist = 7*xsize + 8.  16x9:
        # 128 literals, then a length-16 backref with dist_code 120
        # copies pixels 8..23 into 128..143.  The expectation is
        # computed from the spec semantics (dy*xsize + dx), not from
        # _DIST_MAP itself.
        from zdb_spark.operators.webp import (_canonical_codes,
                                              _flat_complete_lengths)

        w, h = 16, 9
        lit = [(0xFF << 24) | (((i * 2654435761) >> 7 & 0xFF) << 16)
               | (((i * 40503) >> 3 & 0xFF) << 8)
               | (i * 73 + 11 & 0xFF) for i in range(128)]
        # length 16 -> prefix symbol 7 (offset 12, 2 extra bits = 3)
        greens = sorted({(p >> 8) & 0xFF for p in lit}) + [256 + 7]
        g_lengths = _flat_complete_lengths(greens, 280)
        g_codes = _canonical_codes(g_lengths)
        reds = sorted({(p >> 16) & 0xFF for p in lit})
        blues = sorted({p & 0xFF for p in lit})
        r_codes = _canonical_codes(_flat_complete_lengths(reds, 256))
        b_codes = _canonical_codes(_flat_complete_lengths(blues, 256))
        bw = _BitWriter()
        _header(bw, w, h)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        _write_huffman(bw, g_lengths)
        _write_huffman(bw, _flat_complete_lengths(reds, 256))
        _write_huffman(bw, _flat_complete_lengths(blues, 256))
        _write_simple(bw, [0xFF])                   # alpha trivial
        # distance: trivial single-symbol code 13 (offset 96, 5 extra)
        _write_simple(bw, [13])
        for px in lit:
            bw.write_code(*g_codes[(px >> 8) & 0xFF])
            bw.write_code(*r_codes[(px >> 16) & 0xFF])
            bw.write_code(*b_codes[px & 0xFF])
        bw.write_code(*g_codes[256 + 7])            # length 16
        bw.write(3, 2)                              # 12 + 3 + 1 = 16
        bw.write(23, 5)                             # 96 + 23 + 1 = 120
        dw, dh, pix = vp8l_decode(b"\x2f" + bw.bytes())
        assert (dw, dh) == (w, h)
        dist = 7 * w + 8                            # (dx=8, dy=7)
        assert dist == 120
        assert pix == lit + [lit[128 - dist + i] for i in range(16)]

    def test_lz77_direct_distance_beyond_map(self):
        # dist_code > 120 bypasses the map: dist = dist_code - 120.
        # 20x2: 20 literals, then a length-20 backref with
        # dist_code 140 -> dist 20 copies the whole first row.
        from zdb_spark.operators.webp import (_canonical_codes,
                                              _flat_complete_lengths)

        w, h = 20, 2
        lit = [(0xFF << 24) | ((i * 37 + 5 & 0xFF) << 16)
               | ((i * 91 + 3 & 0xFF) << 8) | (i * 17 & 0xFF)
               for i in range(w)]
        # length 20 -> prefix symbol 8 (offset 16, 3 extra bits = 3)
        greens = sorted({(p >> 8) & 0xFF for p in lit}) + [256 + 8]
        g_lengths = _flat_complete_lengths(greens, 280)
        g_codes = _canonical_codes(g_lengths)
        reds = sorted({(p >> 16) & 0xFF for p in lit})
        blues = sorted({p & 0xFF for p in lit})
        r_codes = _canonical_codes(_flat_complete_lengths(reds, 256))
        b_codes = _canonical_codes(_flat_complete_lengths(blues, 256))
        bw = _BitWriter()
        _header(bw, w, h)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        _write_huffman(bw, g_lengths)
        _write_huffman(bw, _flat_complete_lengths(reds, 256))
        _write_huffman(bw, _flat_complete_lengths(blues, 256))
        _write_simple(bw, [0xFF])                   # alpha trivial
        # distance: trivial symbol 14 (offset 128, 6 extra bits)
        _write_simple(bw, [14])
        for px in lit:
            bw.write_code(*g_codes[(px >> 8) & 0xFF])
            bw.write_code(*r_codes[(px >> 16) & 0xFF])
            bw.write_code(*b_codes[px & 0xFF])
        bw.write_code(*g_codes[256 + 8])            # length 20
        bw.write(3, 3)                              # 16 + 3 + 1 = 20
        bw.write(11, 6)                             # 128 + 11 + 1 = 140
        dw, dh, pix = vp8l_decode(b"\x2f" + bw.bytes())
        assert (dw, dh) == (w, h)
        assert pix == lit + lit                     # dist 140-120 = 20

    def test_color_cache(self):
        # find two colors with distinct 1-bit cache slots
        cache_bits = 1
        a = next(0xFF000000 | (v << 8) for v in range(256)
                 if _cache_hash(0xFF000000 | (v << 8), cache_bits) == 0)
        b = next(0xFF000000 | (v << 8) for v in range(256)
                 if _cache_hash(0xFF000000 | (v << 8), cache_bits) == 1)
        ga, gb = (a >> 8) & 0xFF, (b >> 8) & 0xFF
        bw = _BitWriter()
        _header(bw, 2, 2)
        bw.write(0, 1)                              # no transforms
        bw.write(1, 1)                              # color cache ON
        bw.write(cache_bits, 4)
        bw.write(0, 1)                              # no meta
        # green alphabet 256+24+2: symbols {ga, gb, 280, 281} at len 2
        lengths = [0] * 282
        for s in (ga, gb, 280, 281):
            lengths[s] = 2
        _write_huffman(bw, lengths)
        _write_simple(bw, [0])                      # red (both 0)
        _write_simple(bw, [0])                      # blue
        _write_simple(bw, [0xFF])                   # alpha
        _write_simple(bw, [0])                      # distance
        # canonical codes: by symbol order ga<gb<280<281 -> 0,1,2,3
        order = sorted([ga, gb, 280, 281])
        code = {s: i for i, s in enumerate(order)}
        bw.write_code(code[ga], 2)                  # literal a
        bw.write_code(code[gb], 2)                  # literal b
        bw.write_code(code[280], 2)                 # cache[0] == a
        bw.write_code(code[281], 2)                 # cache[1] == b
        w, h, pix = vp8l_decode(b"\x2f" + bw.bytes())
        assert pix == [a, b, a, b]

    def test_color_indexing_with_bundling(self):
        # 4-color palette -> 2 bits/index, 4 px bundled per coded px:
        # 8x1 image decodes from 2 coded pixels
        palette = [0xFF101010, 0xFF202040, 0xFF304080, 0xFF55AA33]
        idx = [0, 1, 2, 3, 3, 2, 1, 0]
        packed = [sum(idx[i + j] << (2 * j) for j in range(4))
                  for i in (0, 4)]
        bw = _BitWriter()
        _header(bw, 8, 1)
        bw.write(1, 1)                              # a transform
        bw.write(3, 2)                              # COLOR_INDEXING
        bw.write(len(palette) - 1, 8)
        # palette sub-image (width 4, height 1), DELTA-coded
        deltas = []
        prev = 0
        for p in palette:
            d = 0
            for sh in (24, 16, 8, 0):
                d |= (((p >> sh) - (prev >> sh)) & 0xFF) << sh
            deltas.append(d)
            prev = p
        bw.write(0, 1)                              # palette: no cache
        _flat_codes(bw)
        for d in deltas:
            _literal(bw, d)
        bw.write(0, 1)                              # end transforms
        bw.write(0, 1)                              # no cache
        bw.write(0, 1)                              # no meta
        _flat_codes(bw)
        for g in packed:                            # bundled indices
            _literal(bw, g << 8)
        w, h, pix = vp8l_decode(b"\x2f" + bw.bytes())
        assert (w, h) == (8, 1)
        assert pix == [palette[i] for i in idx]

    def test_predictor_transform(self):
        # one 4x4 block (size_bits=2 -> 1x1 mode image), mode 2 (T):
        # residuals computed forward in the test, decoder must invert
        w, h = 4, 4
        target = [(0xFF << 24) | (((x * 19 + y * 31) % 256) << 16)
                  | (((x * 7 + y * 3) % 256) << 8)
                  | ((x + y * 61) % 256)
                  for y in range(h) for x in range(w)]

        def sub_px(a, b):                           # per-channel a-b
            out = 0
            for sh in (24, 16, 8, 0):
                out |= (((a >> sh) - (b >> sh)) & 0xFF) << sh
            return out

        residuals = []
        for i, px in enumerate(target):
            x, y = i % w, i // w
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = target[i - 1]
            elif x == 0:
                pred = target[i - w]
            else:
                pred = target[i - w]                # mode 2 = T
            residuals.append(sub_px(px, pred))
        bw = _BitWriter()
        _header(bw, w, h)
        bw.write(1, 1)
        bw.write(0, 2)                              # PREDICTOR
        bw.write(0, 3)                              # size_bits - 2 = 0
        bw.write(0, 1)                              # mode image: no cache
        _flat_codes(bw)
        _literal(bw, 2 << 8)                        # mode 2 in green
        bw.write(0, 1)                              # end transforms
        bw.write(0, 1)
        bw.write(0, 1)
        _flat_codes(bw)
        for r in residuals:
            _literal(bw, r)
        assert vp8l_decode(b"\x2f" + bw.bytes())[2] == target

    def test_color_transform(self):
        # single cte block: g2r=5, g2b=250 (-6), r2b=3; forward
        # subtraction in the test, decoder adds the deltas back
        w, h = 4, 2
        g2r, g2b, r2b = 5, 250, 3

        def delta(t, c):
            st = t - 256 if t >= 128 else t
            sc = c - 256 if c >= 128 else c
            return (st * sc) >> 5

        target = [(0xFF << 24) | (((x * 83 + y * 29) % 256) << 16)
                  | (((x * 11 + y * 47) % 256) << 8)
                  | ((x * 59 + y * 17) % 256)
                  for y in range(h) for x in range(w)]
        stored = []
        for px in target:
            g = (px >> 8) & 0xFF
            r = (px >> 16) & 0xFF
            b = px & 0xFF
            rs = (r - delta(g2r, g)) & 0xFF
            bs = (b - delta(g2b, g) - delta(r2b, r)) & 0xFF
            stored.append((px & 0xFF00FF00) | (rs << 16) | bs)
        bw = _BitWriter()
        _header(bw, w, h)
        bw.write(1, 1)
        bw.write(1, 2)                              # COLOR transform
        bw.write(1, 3)                              # size_bits=3 -> 1 blk
        bw.write(0, 1)                              # cte image: no cache
        _flat_codes(bw)
        _literal(bw, (r2b << 16) | (g2b << 8) | g2r)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        _flat_codes(bw)
        for s in stored:
            _literal(bw, s)
        assert vp8l_decode(b"\x2f" + bw.bytes())[2] == target

    def test_meta_prefix_groups(self):
        # 8x1 image, huffman_bits=2 -> meta image 2x1: left 4 columns
        # group 0 (flat literals), right 4 group 1 (trivial solid)
        left = [0xFF000000 | (v << 16) for v in (1, 2, 3, 4)]
        solid = 0xFF112233
        bw = _BitWriter()
        _header(bw, 8, 1)
        bw.write(0, 1)                              # no transforms
        bw.write(0, 1)                              # no cache
        bw.write(1, 1)                              # meta prefix ON
        bw.write(0, 3)                              # bits = 2
        # meta image 2x1: green byte = group index
        bw.write(0, 1)                              # meta img: no cache
        _flat_codes(bw)
        _literal(bw, 0 << 8)
        _literal(bw, 1 << 8)
        # group 0: flat; group 1: all trivial simple codes
        _flat_codes(bw)
        _write_simple(bw, [(solid >> 8) & 0xFF])
        _write_simple(bw, [(solid >> 16) & 0xFF])
        _write_simple(bw, [solid & 0xFF])
        _write_simple(bw, [(solid >> 24) & 0xFF])
        _write_simple(bw, [0])
        for px in left:                             # group 0 literals
            _literal(bw, px)
        # group 1 pixels consume ZERO bits each (all trivial codes)
        w, h, pix = vp8l_decode(b"\x2f" + bw.bytes())
        assert pix == left + [solid] * 4


class TestErrorPaths:
    def test_loud_raises(self):
        with pytest.raises(ValueError, match="signature"):
            vp8l_decode(b"\x30\x00\x00\x00\x00")
        with pytest.raises(ValueError, match="RIFF/WEBP"):
            webp_decode(b"RIFF\x04\x00\x00\x00WAVE")
        # version != 0
        bw = _BitWriter()
        bw.write(0, 14)
        bw.write(0, 14)
        bw.write(0, 1)
        bw.write(1, 3)
        with pytest.raises(ValueError, match="version"):
            vp8l_decode(b"\x2f" + bw.bytes())
        # truncated stream
        blob = vp8l_encode_pixels(4, 4, [0xFF000000] * 16)
        with pytest.raises(ValueError, match="truncated"):
            vp8l_decode(blob[:6])

    def test_lossy_vp8_refuses_loudly(self):
        vp8 = bytes(3) + b"\x9d\x01\x2a" + struct.pack("<HH", 64, 48)
        with pytest.raises(NotImplementedError, match="lossy VP8"):
            webp_decode(_riff(b"VP8 ", vp8))

    def test_vp8x_container_walks_to_vp8l(self):
        px = [0xFF606060, 0xFF707070]
        vp8l = vp8l_encode_pixels(2, 1, px)
        vp8x = (bytes(4) + (1).to_bytes(3, "little")
                + (0).to_bytes(3, "little"))
        inner = (b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
                 + b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l)
        if len(vp8l) & 1:
            inner += b"\x00"
        payload = (b"RIFF" + struct.pack("<I", 4 + len(inner))
                   + b"WEBP" + inner)
        assert webp_decode_pixels(payload) == (2, 1, px)

    def test_invalid_kraft_code_is_loud(self):
        # green code with a single 8-bit symbol among 280 in NORMAL
        # form and another at length 1: Kraft < 1 -> corrupt
        bw = _BitWriter()
        _header(bw, 1, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        lengths = [0] * 280
        lengths[0] = 8
        lengths[1] = 8
        with pytest.raises(ValueError, match="Kraft"):
            _write_huffman(bw, lengths)
            vp8l_decode(b"\x2f" + bw.bytes())

    def test_cache_bits_out_of_range(self):
        bw = _BitWriter()
        _header(bw, 1, 1)
        bw.write(0, 1)                              # no transforms
        bw.write(1, 1)                              # cache on
        bw.write(12, 4)                             # 12 > 11
        with pytest.raises(ValueError, match="cache bits"):
            vp8l_decode(b"\x2f" + bw.bytes())


class TestSparkIntegration:
    def test_decode_images_webp_and_auto(self, spark):
        from zdb_spark.operators.multimodal import decode_images

        px1 = [0xFF000000 | (v << 8) for v in (10, 20, 30, 40)]
        px2 = [0xFF808080] * 6
        rows = [(1, bytearray(webp_encode_pixels(2, 2, px1))),
                (2, bytearray(webp_encode_pixels(3, 2, px2,
                                                 subtract_green=True)))]
        df = spark.createDataFrame(rows, "id long, blob binary")
        for decoder in ("webp", "auto"):
            got = {r.id: (r.fmt, r.width, r.height, r.channels,
                          r.mean_luma)
                   for r in decode_images(df, "blob", "id",
                                          decoder=decoder).collect()}
            assert got[1][:4] == ("webp", 2, 2, 4)
            assert got[2][:4] == ("webp", 3, 2, 4)
            assert got[2][4] == round(
                (0.299 + 0.587 + 0.114) * 128 / 255.0, 6)


class TestImageHash:
    """Perceptual hashes (operators/imagehash.py): exact-integer
    aHash/dHash, DCT pHash invariances, codec-independence, the
    generic hamming banding, and the Spark operators."""

    @staticmethod
    def _pair(vals, w, h):
        from zdb_spark.operators.multimodal import png_encode_pixels
        from zdb_spark.operators.webp import webp_encode_pixels

        rgb = b"".join(bytes([v, v, v]) for v in vals)
        argb = [(0xFF << 24) | (v << 16) | (v << 8) | v for v in vals]
        return (png_encode_pixels(w, h, 3, rgb),
                webp_encode_pixels(w, h, argb))

    def test_codec_independence_and_determinism(self):
        from zdb_spark.operators.imagehash import (ahash64, dhash64,
                                                   phash64)

        def mix(a):
            a &= 0xFFFFFFFF
            a ^= a >> 16
            a = (a * 0x7FEB352D) & 0xFFFFFFFF
            a ^= a >> 15
            return a

        vals = [mix(i * 2654435761) % 256 for i in range(32 * 32)]
        png, webp = self._pair(vals, 32, 32)
        for fn in (ahash64, dhash64, phash64):
            assert fn(png) == fn(webp) == fn(png)

    def test_phash_brightness_invariance_vs_ahash(self):
        from zdb_spark.operators.imagehash import ahash64, phash64

        vals = [((x * 7 + y * 5) % 200) for y in range(32)
                for x in range(32)]
        _, base = self._pair(vals, 32, 32)
        _, brighter = self._pair([v + 40 for v in vals], 32, 32)
        # pHash excludes DC: a global brightness shift barely moves it
        assert bin(phash64(base) ^ phash64(brighter)).count("1") <= 4
        # aHash thresholds against the (shifted) mean: also stable
        assert bin(ahash64(base) ^ ahash64(brighter)).count("1") <= 4

    def test_dhash_single_comparison_flip(self):
        # flipping one edge cell of a grid-sized image flips EXACTLY
        # one dhash bit — the image_dedup gate's planted construction
        from zdb_spark.operators.imagehash import dhash64

        vals = [1 + ((r * 37 + c * 91) ^ (r * c)) % 254
                for r in range(8) for c in range(9)]
        vals[0] = 0
        _, a = self._pair(vals, 9, 8)
        vals2 = list(vals)
        vals2[0] = 255
        _, b = self._pair(vals2, 9, 8)
        assert bin(dhash64(a) ^ dhash64(b)).count("1") == 1

    def test_loud_refusals(self):
        import pytest

        from zdb_spark.operators.imagehash import (dhash64, gray_grid,
                                                   image_hashes)

        with pytest.raises(ValueError, match="signature"):
            dhash64(b"GIF89a....")
        with pytest.raises(ValueError, match="smaller than"):
            gray_grid(4, 4, [0] * 16, 8, 8)

    def test_spark_hashes_and_near_dup_pairs(self, spark):
        from zdb_spark.operators.imagehash import (dhash64,
                                                   image_hashes,
                                                   image_near_dup_pairs)
        from zdb_spark.operators.webp import webp_encode_pixels

        def mk(vals):
            argb = [(0xFF << 24) | (v << 16) | (v << 8) | v
                    for v in vals]
            return bytearray(webp_encode_pixels(9, 8, argb))

        def mix(a):
            a &= 0xFFFFFFFF
            a ^= a >> 16
            a = (a * 0x7FEB352D) & 0xFFFFFFFF
            a ^= a >> 15
            return a

        base = [1 + mix(i * 40503) % 254 for i in range(72)]
        near = list(base)
        near[0] = 255 if base[0] < 128 else 0     # one edge-cell flip
        far = [1 + mix((i + 999) * 48271) % 254 for i in range(72)]
        df = spark.createDataFrame(
            [(1, mk(base)), (2, mk(near)), (3, mk(far)), (4, None)],
            "id long, blob binary")
        hashed = {r.id: r.hash for r in
                  image_hashes(df, "blob", "id",
                               method="dhash").collect()}
        assert set(hashed) == {1, 2, 3}           # NULL vanishes
        # the Spark-side hash equals the local function (sign-aware)
        local = dhash64(bytes(mk(base)))
        assert hashed[1] & 0xFFFFFFFFFFFFFFFF == local
        pairs = image_near_dup_pairs(df, "blob", "id", method="dhash",
                                     max_hamming=3).collect()
        assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [(1, 2,
                                                                 1)]

    def test_hamming_pairs_generic(self, spark):
        import pytest

        from zdb_spark.operators.dedup import hamming_pairs

        rows = [(1, 0b1010), (2, 0b1011), (3, 0b1010),
                (4, -(1 << 63) | 0b1010)]           # sign-bit differs
        df = spark.createDataFrame(rows, "id long, h long")
        got = sorted((p.id_a, p.id_b, p.hamming) for p in
                     hamming_pairs(df, "h", "id",
                                   max_hamming=1).collect())
        assert got == [(1, 2, 1), (1, 3, 0), (1, 4, 1), (2, 3, 1),
                       (3, 4, 1)]
        # max_hamming=0 (exact-duplicate mining): the single chunk IS
        # the full hash — the (1 << 64) - 1 mask literal would
        # overflow the Java long (r15 review finding)
        exact = sorted((p.id_a, p.id_b) for p in
                       hamming_pairs(df, "h", "id",
                                     max_hamming=0).collect())
        assert exact == [(1, 3)]
        with pytest.raises(ValueError, match="max_hamming"):
            hamming_pairs(df, "h", "id", max_hamming=64)
