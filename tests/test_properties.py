"""Property-based invariants (hypothesis) for the operators whose
correctness arguments are structural: connected-components path
equivalence on random graphs and chunking coverage/size bounds on
random token streams.

Example counts are deliberately small — each example runs Spark jobs —
but random structure covers shapes (cycles, stars, isolated chains,
ragged tails) that the hand-written fixtures don't.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from zdb_spark.operators import dedup
from zdb_spark.operators.curation import chunk_documents

_SETTINGS = dict(max_examples=8, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _reference_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Plain-python reference: min-member label per component."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return {n: find(n) for n in parent}


@given(st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
        lambda p: p[0] != p[1]),
    min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_cluster_paths_agree_on_random_graphs(spark, edges):
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges],
        "id_a long, id_b long").dropDuplicates()
    want = _reference_components(edges)
    fast = {r["doc_id"]: r["cluster_id"] for r in
            dedup.duplicate_clusters(pairs).collect()}
    dist = {r["doc_id"]: r["cluster_id"] for r in
            dedup.duplicate_clusters(pairs, driver_threshold=0).collect()}
    assert fast == want
    assert dist == want


@given(st.lists(st.integers(1, 8), min_size=1, max_size=60),
       st.integers(2, 12), st.integers(0, 5))
@settings(**_SETTINGS)
def test_chunk_coverage_and_bounds(spark, word_lens, max_tokens, overlap):
    if overlap >= max_tokens:
        overlap = max_tokens - 1
    words = [f"w{i}x" * L for i, L in enumerate(word_lens)]
    df = spark.createDataFrame([(1, " ".join(words))],
                               "doc_id long, text string")
    out = sorted(
        chunk_documents(df, "text", "doc_id",
                        max_tokens=max_tokens, overlap=overlap).collect(),
        key=lambda r: r["chunk_idx"])
    # chunk ids are dense from 0; sizes bounded; every token covered in
    # order; consecutive chunks share exactly `overlap` tokens except at
    # the tail
    assert [r["chunk_idx"] for r in out] == list(range(len(out)))
    stride = max_tokens - overlap
    seen: list[str] = []
    for i, r in enumerate(out):
        toks = r["chunk_text"].split()
        assert 1 <= len(toks) <= max_tokens
        assert r["n_chunk_tokens"] == len(toks)
        assert toks == [w.lower() for w in
                        words[i * stride:i * stride + len(toks)]]
        seen = seen[:i * stride] + toks
    assert seen == [w.lower() for w in words]


@given(st.lists(
    st.tuples(st.integers(0, 8),          # user
              st.sampled_from(["a", "b", "c"]),
              st.integers(0, 50)),        # ts
    min_size=1, max_size=60))
@settings(**_SETTINGS)
def test_funnel_users_monotone_and_bounded(spark, events):
    """Structural invariants on random event streams: qualifying USERS
    never increase along the funnel (a step-i+1 user must have qualified
    at step i), and each step's event count is bounded by that step
    type's distinct (user, ts) events.  (Event counts are NOT monotone:
    one anchor can qualify many later events — which random streams
    exercise.)"""
    from zdb_spark.operators.temporal import funnel

    df = spark.createDataFrame(events,
                               "user_id long, event_type string, ts long")
    out = {r["step_idx"]: r for r in
           funnel(df, ["a", "b", "c"], "ts", "user_id",
                  within=20).collect()}
    assert set(out) == {0, 1, 2}
    assert out[1]["n_users"] <= out[0]["n_users"]
    assert out[2]["n_users"] <= out[1]["n_users"]
    for i, step in enumerate(["a", "b", "c"]):
        cap = (df.where(F.col("event_type") == step)
               .select("user_id", "ts").distinct().count())
        assert out[i]["n_events"] <= cap
        assert out[i]["n_users"] <= cap


# --------------------------------------------------------------------- #
# round-7 additions: codec and tokenizer properties (pure Python — no    #
# Spark job per example, so example counts can be generous)              #
# --------------------------------------------------------------------- #

@given(st.integers(2, 8).flatmap(
    lambda mcs: st.tuples(st.just(mcs),
                          st.binary(max_size=4096).map(
                              lambda b: bytes(x % (1 << mcs) for x in b)))))
@settings(max_examples=60, deadline=None)
def test_lzw_roundtrip_property(mcs_data):
    from zdb_spark.operators.multimodal import (_lzw_compress,
                                                _lzw_decompress)

    mcs, data = mcs_data
    assert _lzw_decompress(_lzw_compress(data, mcs), mcs) == data


@given(st.integers(1, 20), st.integers(1, 16),
       st.lists(st.tuples(st.tuples(st.integers(0, 255),
                                    st.integers(0, 255),
                                    st.integers(0, 255)),
                          st.integers(0, 600)),
                min_size=1, max_size=6))
@settings(max_examples=25, deadline=None)
def test_gif_roundtrip_property(w, h, frames):
    from zdb_spark.operators.multimodal import (_gif_parse, gif_decode,
                                                gif_encode)

    blob = gif_encode(w, h, frames)
    fmt, codec, gw, gh, nf, dur = gif_decode(blob)
    assert (fmt, codec, gw, gh, nf) == ("gif", "lzw", w, h, len(frames))
    assert dur == round(sum(d for _, d in frames) / 100.0, 6)
    for fr, ((r, g, b), delay) in zip(_gif_parse(blob)[2], frames):
        assert fr["delay_cs"] == delay
        assert set(fr["pixels"]) == {0}          # solid index-0 frames
        assert fr["palette"][0] == (r, g, b)


@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=300),
       st.sampled_from([1, 2, 4]))
@settings(max_examples=40, deadline=None)
def test_wav_decimation_property(frames, factor):
    from zdb_spark.operators.multimodal import (_wav_samples, wav_encode,
                                                wav_resample)

    blob = wav_encode(8000, 1, frames)
    sr, ch, kept = _wav_samples(wav_resample(blob, factor))
    assert sr == 8000 // factor and ch == 1
    assert list(kept) == frames[::factor]


@given(st.integers(1, 12), st.integers(1, 12),
       st.integers(1, 12), st.integers(1, 12),
       st.sampled_from([1, 3]))
@settings(max_examples=30, deadline=None)
def test_png_resize_nn_property(w, h, ow, oh, nch):
    from zdb_spark.operators.multimodal import (_png_pixels,
                                                png_encode_pixels,
                                                png_resize)

    px = bytes((x * 31 + 7) % 256 for x in range(w * h * nch))
    out = _png_pixels(png_resize(png_encode_pixels(w, h, nch, px),
                                 ow, oh))[4]
    exp = bytearray()
    for y2 in range(oh):
        for x2 in range(ow):
            s = ((y2 * h // oh) * w + (x2 * w // ow)) * nch
            exp += px[s:s + nch]
    assert bytes(out) == bytes(exp)


@given(st.lists(st.text(alphabet="abcdef", min_size=0, max_size=8),
                min_size=0, max_size=12))
@settings(max_examples=40, deadline=None)
def test_bpe_udf_segmentation_reconstructs_words(words):
    """Pure-python check of the greedy-rank runtime: concatenating a
    word's tokens must reproduce word+EOW for ANY merge table."""
    from zdb_spark.operators.tokenize import EOW

    merges = [("a", "b"), ("ab", "c"), ("d", "e"), ("e", EOW),
              ("c", "d"), ("b", "c")]
    ranks = {p: i for i, p in enumerate(merges)}

    def seg(word):
        syms = list(word) + [EOW]
        while len(syms) > 1:
            best_i, best_r = -1, None
            for i, pair in enumerate(zip(syms, syms[1:])):
                r = ranks.get(pair)
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    for w in words:
        assert "".join(seg(w)) == w + EOW


@given(st.lists(st.text(alphabet="abcxyz ", min_size=0, max_size=40),
                min_size=1, max_size=8))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_chain_equals_udf_property(spark, texts):
    from zdb_spark.operators.tokenize import (apply_bpe, apply_bpe_udf,
                                              train_bpe)

    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    merges = train_bpe(docs, "text", n_merges=6, min_pair_count=1)
    a = {r["id"]: r["tokens"] for r in apply_bpe(docs, merges).collect()}
    b = {r["id"]: r["tokens"]
         for r in apply_bpe_udf(docs, merges).collect()}
    assert a == b


@given(st.lists(st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
                         min_size=0, max_size=9),
                min_size=1, max_size=6))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_paragraph_dedup_invariants(spark, docs_words):
    """(a) kept <= total paragraphs per doc; (b) across the corpus,
    distinct paragraph contents survive EXACTLY once; (c) every clean
    text is a subsequence of its source's paragraphs."""
    from zdb_spark.operators.dedup import dedup_paragraphs

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_paragraphs(docs, "text", "doc_id", para_tokens=2).collect()
    kept_total = 0
    all_paras = set()
    for i, ws in enumerate(docs_words):
        toks = (" ".join(ws)).strip().lower().split() or [""]
        paras = [" ".join(toks[j:j + 2]) for j in range(0, len(toks), 2)]
        all_paras.update(paras)
    for r in out:
        assert 0 <= r["n_kept"] <= r["n_paras"]
        kept_total += r["n_kept"]
        src = rows[r["id"]][1].strip().lower()
        for p in (r["clean_text"].split() if r["clean_text"] else []):
            assert p in src.split()
    assert kept_total == len(all_paras)


@given(st.binary(max_size=600))
@settings(max_examples=120, deadline=1000)
def test_decoders_fail_fast_on_garbage(blob):
    """Malformed input must either parse or raise promptly — never hang,
    never return junk silently for structured prefixes.  (hypothesis'
    deadline enforces the 'promptly'.)"""
    from zdb_spark.operators.multimodal import (gif_decode, png_decode,
                                                wav_decode)

    for dec in (png_decode, wav_decode, gif_decode):
        try:
            out = dec(blob)
            assert isinstance(out, tuple)
        except Exception:
            pass


@given(st.binary(max_size=400), st.integers(2, 8))
@settings(max_examples=80, deadline=1000)
def test_lzw_decompress_never_hangs_on_garbage(data, mcs):
    from zdb_spark.operators.multimodal import _lzw_decompress

    try:
        _lzw_decompress(data, mcs)
    except Exception:
        pass


@given(st.binary(min_size=6, max_size=500).map(lambda b: b"GIF89a" + b))
@settings(max_examples=80, deadline=1000)
def test_gif_parse_bounded_on_header_prefixed_garbage(blob):
    from zdb_spark.operators.multimodal import _gif_parse

    try:
        _gif_parse(blob)
    except Exception:
        pass


@given(st.lists(st.integers(min_value=0, max_value=2000), min_size=0,
                max_size=60),
       st.integers(min_value=1, max_value=50),
       st.lists(st.integers(min_value=0, max_value=59), max_size=6))
@settings(max_examples=200, deadline=1000)
def test_sessionize_chunked_merge_equals_batch(ts_list, gap, cut_points):
    """Batch-parity property for the streaming sessionizer's core: the
    events split across arbitrary micro-batches (arbitrary order and
    chunk boundaries), folded through _merge_session_items with the
    open session carried as compressed state, must produce EXACTLY the
    sessions a single-pass batch engine derives from the sorted events.

    One caveat is part of the contract: a session already closed and
    emitted in an earlier batch cannot be reopened by a later straggler
    that bridges into it — such stragglers form their own session.  The
    property therefore feeds chunks in a sorted-batch order (each
    chunk's events may be arbitrary, but chunks are cut from the sorted
    stream), which is the regime where the operator promises exactness.
    """
    from zdb_spark.streaming.ingest import _merge_session_items

    gap = gap * 10
    events = sorted(ts_list)
    # expected: one-pass batch sessionization over sorted events
    expected = []
    for t in events:
        if expected and t - expected[-1][1] <= gap:
            expected[-1][1] = t
            expected[-1][2] += 1
        else:
            expected.append([t, t, 1])
    expected = [tuple(s) for s in expected]

    # actual: cut the sorted stream into chunks at the given points,
    # shuffle WITHIN each chunk deterministically, fold with state
    cuts = sorted({c for c in cut_points if c < len(events)})
    chunks, prev = [], 0
    for c in cuts + [len(events)]:
        if c > prev:
            chunk = events[prev:c]
            chunk.reverse()  # worst-case intra-batch order
            chunks.append(chunk)
            prev = c
    closed_all, state = [], None
    for chunk in chunks:
        items = ([state] if state is not None else []) + \
            [(t, t, 1) for t in chunk]
        closed, state = _merge_session_items(items, gap)
        closed_all.extend(closed)
    if state is not None:
        closed_all.append(state)
    assert sorted(closed_all) == expected


@given(st.lists(
    st.lists(st.integers(-50, 50).map(lambda v: v / 10.0),
             min_size=3, max_size=3),
    min_size=2, max_size=25))
@settings(**_SETTINGS)
def test_kmeans_invariant_to_partitioning(spark, vectors):
    """Lloyd training must land on identical centroids regardless of
    how rows are laid out — the per-iteration rounding exists precisely
    so summation order cannot leak into the result."""
    from zdb_spark.operators.similarity import kmeans_lloyd
    rows = [(i, v) for i, v in enumerate(vectors)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # second centroid sits at the data range's corner so generated sets
    # genuinely split across clusters (and can still leave it empty —
    # both the multi-cluster and the empty-carry branches are exercised)
    init = [vectors[0], [5.0, 5.0, 5.0]]
    a = kmeans_lloyd(df.repartition(1), "embedding", init, iters=2)
    b = kmeans_lloyd(df.repartition(7), "embedding", init, iters=2)
    assert a == b


@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=60,
                unique=True),
       st.integers(1, 5))
@settings(**_SETTINGS)
def test_global_shuffle_is_permutation_property(spark, ids, n_shards):
    """On ANY id set: pos is a 0..n-1 permutation, shard = pos % n,
    and the assignment is invariant to input partitioning."""
    from zdb_spark.operators.curation import global_shuffle

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = global_shuffle(df, "doc_id", n_shards=n_shards).collect()
    assert sorted(r.pos for r in out) == list(range(len(ids)))
    assert all(r.shard == r.pos % n_shards for r in out)
    again = {r.doc_id: r.pos for r in
             global_shuffle(df.repartition(7), "doc_id",
                            n_shards=n_shards).collect()}
    assert again == {r.doc_id: r.pos for r in out}


@given(st.lists(st.lists(st.sampled_from(["nav", "body", "foot", "x y",
                                          ""]),
                         min_size=1, max_size=8),
                min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_strip_repeated_lines_idempotent_and_order_preserving(spark,
                                                              docs):
    """strip(strip(x)) == strip(x); output lines are the input's
    first-occurrence subsequence (python reference)."""
    from zdb_spark.operators.text import strip_repeated_lines

    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(docs)],
        "doc_id long, text string")
    once = {r.doc_id: r.clean_text for r in
            strip_repeated_lines(df).collect()}
    for i, lines in enumerate(docs):
        seen, want = set(), []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                want.append(ln)
        assert once[i] == "\n".join(want), (i, lines)
    df2 = spark.createDataFrame(
        [(i, t) for i, t in once.items()], "doc_id long, text string")
    twice = {r.doc_id: r.clean_text for r in
             strip_repeated_lines(df2).collect()}
    assert twice == once


@given(st.lists(st.lists(st.floats(-8, 8, allow_nan=False,
                                   width=32),
                         min_size=3, max_size=3),
                min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_quantize_roundtrip_error_bound_property(spark, vecs):
    """For ANY float32 vectors: codes stay in [-qmax, qmax] and
    per-coordinate dequantization error <= scale/2."""
    import numpy as np

    from zdb_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    for r in quantize_embeddings(df, "embedding").collect():
        x = np.array(vecs[r.vec_id], dtype=np.float32).astype(np.float64)
        codes = np.array(r.codes)
        assert np.abs(codes).max(initial=0) <= 127
        if r.scale == 0.0:
            assert (codes == 0).all()
        else:
            assert np.abs(codes * r.scale - x).max() <= r.scale / 2 + 1e-12


@given(st.integers(1, 3).flatmap(lambda nch: st.tuples(
    st.integers(4, 24), st.integers(4, 24), st.just(nch),
    st.integers(0, 2**31 - 1))),
    st.sampled_from(["444", "420"]), st.integers(0, 3),
    st.booleans(), st.booleans())
@settings(max_examples=25, deadline=20000,
          suppress_health_check=[HealthCheck.too_slow])
def test_jpeg_roundtrip_property(dims, sub, ri, inter, progressive):
    """Random small images survive encode→decode with bounded error at
    q=95, for both subsampling layouts, with/without restarts, and for
    BOTH frame types — baseline SOF0 (interleaved or not) and
    progressive SOF2 (DC/AC first+refinement scans, EOB runs); the
    progressive decode must equal the baseline decode bit-for-bit
    (identical quantized coefficients, identical IDCT)."""
    import numpy as np

    from zdb_spark.operators.jpeg import (jpeg_decode_pixels,
                                          jpeg_encode_pixels)

    w, h, nch, seed = dims
    rng = np.random.default_rng(seed)
    # smooth-ish content (random low-freq base + mild noise): JPEG's
    # error bound is only meaningful off the pathological pure-noise case
    base = rng.integers(0, 256, size=(2, 2) if nch == 1 else (2, 2, 3))
    px = np.kron(base, np.ones((h // 2 + 1, w // 2 + 1) if nch == 1
                               else (h // 2 + 1, w // 2 + 1, 1)))
    px = px[:h, :w].astype(np.uint8)
    if nch == 2:          # no 2-channel JPEG: exercise grayscale
        px = px[..., 0] if px.ndim == 3 else px
    enc = jpeg_encode_pixels(px, quality=95, subsampling=sub,
                             restart_interval=ri, interleave=inter)
    dec = jpeg_decode_pixels(enc)
    assert dec.shape == px.shape
    if progressive:
        enc_p = jpeg_encode_pixels(px, quality=95, subsampling=sub,
                                   restart_interval=ri,
                                   progressive=True)
        assert np.array_equal(jpeg_decode_pixels(enc_p), dec), \
            "progressive decode != baseline decode"
    err = abs(dec.astype(int) - px.astype(int)).mean()
    # 4:2:0 chroma averaging is LOSSY by design: a saturated chroma
    # edge at an odd offset on a tiny image can cost ~40 mean error
    # before any quantization (e.g. a 4x4 with 3x3/1x1 color regions).
    # Bound against the codec-independent ideal — RGB->YCbCr, 2x2
    # box-downsample chroma, replicate-upsample, back — plus fixed
    # quantization slack, so the test rejects scrambling (which lands
    # 60+ ABOVE the ideal) without rejecting subsampling itself.
    ideal = 0.0
    if sub == "420" and px.ndim == 3:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        ph, pw = (px.shape[0] + 1) // 2 * 2, (px.shape[1] + 1) // 2 * 2
        def sub420(c):
            p = np.pad(c, ((0, ph - c.shape[0]), (0, pw - c.shape[1])),
                       mode="edge")
            d = p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            return np.kron(d, np.ones((2, 2)))[:c.shape[0], :c.shape[1]]
        cb2, cr2 = sub420(cb), sub420(cr)
        ref = np.clip(np.stack([y + 1.402 * (cr2 - 128),
                                y - 0.344136 * (cb2 - 128)
                                - 0.714136 * (cr2 - 128),
                                y + 1.772 * (cb2 - 128)], -1).round(),
                      0, 255)
        ideal = abs(ref - px).mean()
    assert err < ideal + 24, (err, ideal)


@given(st.binary(max_size=600))
@settings(max_examples=100, deadline=2000)
def test_jpeg_decode_fails_fast_on_garbage(blob):
    """Garbage (with or without a JPEG SOI prefix) must raise promptly —
    never hang, never return a tuple for unstructured bytes — and raise
    the ONE documented exception family (ValueError /
    NotImplementedError), never an internal IndexError/struct.error,
    so corpus-scale decode_images can catch consistently."""
    from zdb_spark.operators.jpeg import jpeg_decode_pixels

    for payload in (blob, b"\xff\xd8\xff" + blob):
        try:
            jpeg_decode_pixels(payload)
        except (ValueError, NotImplementedError):
            pass


def test_jpeg_decode_truncation_is_valueerror():
    """The two truncation shapes the fuzz corpus missed: a stream
    ending in a lone 0xFF (marker byte cut off) and a stream cut
    inside the 2-byte segment-length field."""
    import pytest

    from zdb_spark.operators.jpeg import jpeg_decode_pixels

    with pytest.raises(ValueError, match="truncated JPEG"):
        jpeg_decode_pixels(b"\xff\xd8\xff")            # lone 0xFF
    with pytest.raises(ValueError, match="truncated JPEG"):
        jpeg_decode_pixels(b"\xff\xd8\xff\xdb\x00")    # half a length


def test_jpeg_undefined_tables_are_valueerror():
    """A scan referencing a Huffman table the stream never defined is
    corrupt data, not an internal KeyError — for the baseline AND the
    progressive paths."""
    import pytest

    from zdb_spark.operators.jpeg import (jpeg_decode_pixels,
                                          jpeg_encode, jpeg_encode_pixels)
    import numpy as np

    blob = bytearray(jpeg_encode(8, 8, (50,)))
    i = bytes(blob).find(b"\xff\xc4")           # drop the first DHT
    ln = int.from_bytes(blob[i + 2:i + 4], "big")
    del blob[i:i + 2 + ln]
    with pytest.raises(ValueError, match="undefined"):
        jpeg_decode_pixels(bytes(blob))

    prog = bytearray(jpeg_encode_pixels(
        np.full((8, 8), 50, np.uint8), progressive=True))
    i = bytes(prog).find(b"\xff\xc4")
    ln = int.from_bytes(prog[i + 2:i + 4], "big")
    del prog[i:i + 2 + ln]
    with pytest.raises(ValueError, match="undefined"):
        jpeg_decode_pixels(bytes(prog))


@given(st.lists(st.text(alphabet="abcdxyz", min_size=1, max_size=12),
                min_size=1, max_size=20),
       st.lists(st.tuples(st.text(alphabet="abcd", min_size=1,
                                  max_size=3),
                          st.floats(-9, -0.5)),
                min_size=1, max_size=8))
@settings(max_examples=60, deadline=5000)
def test_unigram_viterbi_total_and_reconstructs(words, vocab):
    """Viterbi segmentation is TOTAL (any word, any vocab — unknown
    chars fall back) and concatenating the pieces always reconstructs
    the word exactly."""
    from zdb_spark.operators.tokenize import _viterbi_segment

    probs = {p: round(lp, 6) for p, lp in vocab}
    for w in words:
        seg = _viterbi_segment(w, probs, max_len=3)
        assert "".join(seg) == w
        assert all(seg)


@given(st.integers(1, 40), st.integers(1, 6), st.integers(0, 2**31 - 1))
@settings(max_examples=15, deadline=30000,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_tar_export_partition_and_roundtrip(spark, n_rows, n_shards,
                                            seed):
    """Every sample lands in exactly one shard, membership follows the
    md5 recipe, and the tar roundtrip loses nothing — for random row
    counts and shard counts."""
    import random
    import tempfile

    from zdb_spark.operators.curation import _hash_bucket
    from zdb_spark.sources.writers import (export_tar_shards,
                                           read_tar_shards)

    rnd = random.Random(seed)
    rows = [(i, "".join(rnd.choices("abcdef", k=rnd.randint(0, 12))))
            for i in range(n_rows)]
    df = spark.createDataFrame(rows, "doc_id long, txt string")
    with tempfile.TemporaryDirectory() as d:
        m = export_tar_shards(df, d, n_shards, "doc_id", {"txt": "t"})
        assert m["rows"] == n_rows
        back = read_tar_shards(spark, d).collect()
        assert len(back) == n_rows
        got = {int(r.key): (bytes(r.content).decode(), r.shard)
               for r in back}
        want_shard = {r["doc_id"]: int(r["s"]) for r in df.select(
            "doc_id", (_hash_bucket("doc_id", "v1") % n_shards)
            .alias("s")).collect()}
        for i, txt in rows:
            assert got[i] == (txt, want_shard[i])


@given(st.lists(st.text(min_size=0, max_size=12), min_size=1,
                max_size=120))
@settings(max_examples=10, deadline=30000,
          suppress_health_check=[HealthCheck.too_slow])
def test_hll_registers_match_python_reference(spark, vals):
    """The portable HLL's hex-shape rho arithmetic (leading '0'
    nibbles + a CASE on the first nonzero nibble) must equal the
    definitional bit-count on arbitrary unicode values: rho =
    49 - bit_length(48-bit rank word), 49 for the all-zero word —
    the cross-engine determinism claim the gate oracle relies on."""
    import hashlib

    from zdb_spark.operators.sketches import (HLL_RHO_MAX,
                                              hll_registers)

    want: dict[int, int] = {}
    for v in vals:
        h = hashlib.md5(v.encode("utf-8")).hexdigest()
        bucket = int(h[:2], 16)
        w = int(h[2:14], 16)
        rho = HLL_RHO_MAX - w.bit_length() if w else HLL_RHO_MAX
        want[bucket] = max(want.get(bucket, 0), rho)
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {r.bucket: r.max_rho
           for r in hll_registers(df, "v").collect()}
    assert got == want


@given(st.lists(st.text(min_size=0, max_size=10), min_size=1,
                max_size=100))
@settings(max_examples=8, deadline=30000,
          suppress_health_check=[HealthCheck.too_slow])
def test_countmin_cells_match_python_reference(spark, vals):
    """The count-min table's md5 addressing must equal the pure-python
    definition cell-for-cell on arbitrary unicode values, and every
    probe estimate must satisfy the sketch's one-sided guarantee
    (never underestimates the true count)."""
    import hashlib
    from collections import Counter

    from zdb_spark.operators.sketches import (countmin_lookup,
                                              countmin_table)

    depth, width = 3, 64
    want: dict[tuple[int, int], int] = {}
    for v in vals:
        for d in range(depth):
            h = hashlib.md5(f"{d}:{v}".encode("utf-8")).hexdigest()
            cell = (d, int(h[:8], 16) % width)
            want[cell] = want.get(cell, 0) + 1
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    tbl = countmin_table(df, "v", depth=depth, width=width)
    got = {(r.row, r.bucket): r.n for r in tbl.collect()}
    assert got == want
    truth = Counter(vals)
    probes = list(truth)[:5]
    est = {r.value: r.est_count for r in countmin_lookup(
        tbl, probes, depth=depth, width=width).collect()}
    for p in probes:
        assert est[p] >= truth[p]


@given(st.integers(1, 4096), st.integers(1, 4096),
       st.integers(0, 100000), st.integers(0, 3600 * 100),
       st.sampled_from([600, 1000, 90000]))
@settings(max_examples=60, deadline=None)
def test_mp4_probe_roundtrip_property(w, h, nf, dur_cs, ts):
    """ISO BMFF fixture -> probe recovers dims/frames/duration exactly
    (duration to the timescale's own resolution)."""
    from zdb_spark.operators.multimodal import mp4_encode, mp4_probe

    dur = dur_cs / 100.0
    brand, codec, gw, gh, gnf, gdur = mp4_probe(
        mp4_encode(w, h, nf, dur, timescale=ts))
    assert (brand, codec, gw, gh, gnf) == ("isom", "avc1", w, h, nf)
    assert abs(gdur - dur) <= 1.0 / ts + 1e-9


@given(st.binary(max_size=400))
@settings(max_examples=100, deadline=2000)
def test_mp4_probe_fails_fast_on_garbage(blob):
    """Garbage (raw, or grafted after a valid ftyp header) must raise
    the ValueError family promptly — box walking is bounds-checked."""
    from zdb_spark.operators.multimodal import mp4_encode, mp4_probe

    head = mp4_encode(8, 8, 1, 1.0)[:20]
    for payload in (blob, head + blob):
        try:
            mp4_probe(payload)
        except ValueError:
            pass


@given(st.integers(1, 8191), st.integers(1, 8191),
       st.integers(0, 3600 * 100), st.sampled_from(["webm", "matroska"]))
@settings(max_examples=60, deadline=None)
def test_webm_probe_roundtrip_property(w, h, dur_cs, doctype):
    from zdb_spark.operators.multimodal import webm_encode, webm_probe

    dur = dur_cs / 100.0
    dt, codec, gw, gh, nf, gdur = webm_probe(webm_encode(w, h, dur,
                                                         doctype=doctype))
    assert (dt, codec, gw, gh, nf) == (doctype, "V_VP9", w, h, 0)
    assert abs(gdur - dur) < 1e-6


@given(st.binary(max_size=400))
@settings(max_examples=100, deadline=2000)
def test_webm_probe_fails_fast_on_garbage(blob):
    from zdb_spark.operators.multimodal import webm_probe

    for payload in (blob, b"\x1aE\xdf\xa3" + blob):
        try:
            webm_probe(payload)
        except ValueError:
            pass


# ---------------------------------------------------------------------- #
# extraction round-trips (pure Python — no Spark per example)             #
# ---------------------------------------------------------------------- #
_PDF_TEXT = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=255),
    min_size=0, max_size=400)


@given(_PDF_TEXT)
@settings(max_examples=200, deadline=None)
def test_pdf_roundtrip_property(text):
    """pdf_to_text(pdf_write_simple(t)) == whitespace-normalized t for
    ANY latin-1 payload — escapes, octal bytes, parens, backslashes,
    newlines, and control characters all survive the writer->lexer->
    content-interpreter loop (both compressed and plain)."""
    from zdb_spark.operators.extract import pdf_to_text, pdf_write_simple

    expect = "\n".join(
        line for line in (" ".join(ln.split()) for ln in text.split("\n"))
        if line)
    assert pdf_to_text(pdf_write_simple(text)) == expect
    assert pdf_to_text(pdf_write_simple(text, compress=False)) == expect


@given(_PDF_TEXT)
@settings(max_examples=200, deadline=None)
def test_pdf_xref_stream_roundtrip_property(text):
    """The PDF 1.5 writer (xref STREAM + ObjStm + PNG Up predictor)
    round-trips identically to the classic writer for ANY latin-1
    payload — one property pins the whole §7.5.7/§7.5.8 read path."""
    from zdb_spark.operators.extract import (pdf_to_text,
                                             pdf_write_xref_stream)

    expect = "\n".join(
        line for line in (" ".join(ln.split()) for ln in text.split("\n"))
        if line)
    assert pdf_to_text(pdf_write_xref_stream(text)) == expect
    assert pdf_to_text(pdf_write_xref_stream(text,
                                             compress=False)) == expect


@given(st.text(min_size=0, max_size=300))
@settings(max_examples=200, deadline=None)
def test_html_escape_roundtrip_property(text):
    """html_to_text(<p>escape(t)</p>) == whitespace-normalized t for
    ANY unicode payload: entity encoding and decode are inverses, and
    markup-significant characters in data never leak structure."""
    import html as _html

    from zdb_spark.operators.extract import html_to_text

    norm = " ".join(text.split())
    assert html_to_text(f"<p>{_html.escape(text)}</p>") == norm


@given(st.text(alphabet="ab<>&\"'/=! ptqxs", min_size=0, max_size=120))
@settings(max_examples=300, deadline=None)
def test_html_extractor_total_on_tag_soup(text):
    """html_to_text never raises on arbitrary tag soup (the crawl
    reality), and its output contains no unterminated entity the
    parser should have consumed."""
    from zdb_spark.operators.extract import html_to_text

    out = html_to_text(text)          # must not raise
    assert "\x00" not in out


_MD_PLAIN = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz \n"),
    min_size=0, max_size=300)


@given(_MD_PLAIN)
@settings(max_examples=150, deadline=None)
def test_markdown_plain_prose_roundtrip_property(text):
    """Prose with no markdown metacharacters passes through
    markdown_to_text as pure line-wise whitespace normalization — the
    invariant the staged md_extract oracle builds on (the corpus is
    verified metacharacter-free)."""
    from zdb_spark.operators.extract import markdown_to_text

    expect = "\n".join(
        line for line in (" ".join(ln.split()) for ln in text.split("\n"))
        if line)
    assert markdown_to_text(text) == expect


@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2 ** 32 - 1))
@settings(max_examples=60, deadline=None)
def test_bmp_tiff_roundtrip_property(w, h, seed):
    """Random RGB rasters round-trip the BMP and TIFF codecs to the
    same (w, h, channels, exact-integer-sum luma)."""
    import numpy as np

    from zdb_spark.operators.multimodal import (bmp_decode, bmp_encode,
                                                tiff_decode, tiff_encode)

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    exp = round(float(
        (0.299 * px[:, :, 0].mean() + 0.587 * px[:, :, 1].mean()
         + 0.114 * px[:, :, 2].mean()) / 255.0), 6)
    for codec, (fmt, gw, gh, nch, luma) in (
            ("bmp", bmp_decode(bmp_encode(px))),
            ("tiff", tiff_decode(tiff_encode(px)))):
        assert (fmt, gw, gh, nch) == (codec, w, h, 3)
        assert abs(luma - exp) <= 1e-6, (codec, luma, exp)
