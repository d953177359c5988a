"""HTML text extraction (operators/extract.py): the crawl-ingest stage
— tag stripping, script/style subtree removal, entity decoding, block
newlines, whitespace collapse — pure-Python contract plus the
Arrow-batched Spark form and a fixture round-trip."""

import html as _html
import os

import pytest

from pyspark.sql import functions as F


class TestHtmlToText:
    def test_full_contract(self):
        from zdb_spark.operators.extract import html_to_text

        h = ('<html><head><title>Doc 7</title><script>var x="<p>";'
             '</script><style>p{color:red}</style></head><body>'
             '<nav>Site &amp; Nav</nav><p>hello   <b>world</b>\n  '
             'again</p><div>second<br/>third</div>'
             '<ul><li>a</li><li>b</li></ul></body></html>')
        assert html_to_text(h) == ("Doc 7\nSite & Nav\n"
                                   "hello world again\nsecond\nthird"
                                   "\na\nb")

    def test_plain_text_passthrough_and_entities(self):
        from zdb_spark.operators.extract import html_to_text

        assert html_to_text("plain no markup") == "plain no markup"
        assert html_to_text('a &lt;tag&gt; &quot;q&quot; &#65;') \
            == 'a <tag> "q" A'

    def test_malformed_markup_is_lenient(self):
        from zdb_spark.operators.extract import html_to_text

        # unclosed script suppresses the rest — code never leaks
        assert html_to_text("<p>unclosed <script>bad(); rest") \
            == "unclosed"
        # stray close tags never go negative
        assert html_to_text("</script>stray <p>ok</p>") == "stray\nok"
        assert html_to_text("") == ""

    def test_inline_tags_dont_break_sentences(self):
        from zdb_spark.operators.extract import html_to_text

        assert html_to_text("<p>a <a href='x'>link</a> inside</p>") \
            == "a link inside"


class TestExtractHtml:
    def test_spark_column_with_nulls(self, spark):
        from zdb_spark.operators.extract import extract_html

        df = spark.createDataFrame(
            [(1, "<p>hi &amp; bye</p>"), (2, None)],
            "id long, html string")
        got = {r.id: r.text for r in
               extract_html(df, "html").collect()}
        assert got == {1: "hi & bye", 2: None}

    def test_fixture_roundtrip_on_corpus(self, spark, sf_dir):
        """Wrapping every document's (escaped) text in a deterministic
        HTML template and extracting must give back the normalized
        text — the html_extract gate's contract, pinned locally."""
        import pandas as pd

        from zdb_spark.operators.extract import extract_html

        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")).limit(50)

        @F.pandas_udf("string")
        def wrap(i: pd.Series, t: pd.Series) -> pd.Series:
            return pd.Series(
                f'<html><head><title>Doc {a}</title>'
                f'<script>var x = 1 < 2;</script></head><body>'
                f'<nav>Site &amp; Nav</nav><p>{_html.escape(b)}</p>'
                f'</body></html>'
                for a, b in zip(i, t))

        fixture = docs.select(
            "doc_id", "text", wrap("doc_id", "text").alias("html"))
        out = extract_html(fixture, "html", "extracted").collect()
        for r in out:
            norm = " ".join(r.text.split())
            expect = f"Doc {r.doc_id}\nSite & Nav"
            if norm:
                expect += "\n" + norm
            assert r.extracted == expect, r.doc_id


class TestPdfToText:
    def test_roundtrip_compressed_and_plain(self):
        from zdb_spark.operators.extract import (pdf_to_text,
                                                 pdf_write_simple)

        t = "hello world (parens) and \\ backslash\nsecond line  spaced"
        expect = "hello world (parens) and \\ backslash\nsecond line spaced"
        assert pdf_to_text(pdf_write_simple(t)) == expect
        assert pdf_to_text(pdf_write_simple(t, compress=False)) == expect

    def test_octal_escapes_roundtrip(self):
        from zdb_spark.operators.extract import (pdf_to_text,
                                                 pdf_write_simple)

        t = "caf\xe9 r\xe9sum\xe9"          # latin-1, written as \ooo
        assert pdf_to_text(pdf_write_simple(t)) == t

    def test_content_stream_operators(self):
        # hand-written content exercising TJ arrays (kerning numbers
        # dropped), the ' next-line-show form, and hex strings
        from zdb_spark.operators.extract import _content_text_lines

        content = (b"BT (AB) Tj [(CD) -120 (EF)] TJ T* (line2) Tj "
                   b"(line3) ' <414243> Tj ET")
        # consecutive shows on one line concatenate WITHOUT a space —
        # PDF positions glyphs via graphics state, not characters
        assert _content_text_lines(content) == \
            ["ABCDEF", "line2", "line3ABC"]

    def test_multi_page_and_contents_array(self):
        # two pages via the writer? writer is single-page — splice two
        # written pdfs' semantics by checking the page-tree walk on one
        from zdb_spark.operators.extract import (pdf_to_text,
                                                 pdf_write_simple)

        out = pdf_to_text(pdf_write_simple("a\nb\nc"))
        assert out == "a\nb\nc"

    def test_error_paths_are_loud(self):
        import re as _re

        import pytest as _pytest

        from zdb_spark.operators.extract import (pdf_to_text,
                                                 pdf_write_simple)

        with _pytest.raises(ValueError, match="startxref"):
            pdf_to_text(b"%PDF-1.4 garbage")
        # startxref pointing at a non-XRef object: parsed as an xref
        # stream candidate (PDF 1.5 form) and refused loudly when the
        # dict isn't /Type /XRef
        doc = pdf_write_simple("x")
        m = list(_re.finditer(rb"startxref\s+(\d+)", doc))[-1]
        patched = doc[:m.start(1)] + b"0000000009" + doc[m.end(1):]
        with _pytest.raises(ValueError, match="XRef"):
            pdf_to_text(patched)
        # unsupported filter: same-LENGTH name swap keeps every xref
        # byte offset valid, so the failure is the filter's, not the
        # xref's
        bad = pdf_write_simple("x").replace(b"/FlateDecode",
                                            b"/LZWWWDecode")
        with _pytest.raises(NotImplementedError, match="LZWWWDecode"):
            pdf_to_text(bad)
        # encryption refused at the trailer
        enc = pdf_write_simple("x").replace(
            b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
        with _pytest.raises(NotImplementedError, match="encrypt"):
            pdf_to_text(enc)

    def test_spark_column(self, spark):
        from zdb_spark.operators.extract import (extract_pdf,
                                                 pdf_write_simple)

        rows = [(1, bytearray(pdf_write_simple("doc one"))),
                (2, None)]
        df = spark.createDataFrame(rows, "id long, pdf binary")
        got = {r.id: r.text for r in extract_pdf(df).collect()}
        assert got == {1: "doc one", 2: None}


class TestPdfHardening:
    def test_unterminated_hex_and_xref_subsection(self):
        import pytest as _pytest

        from zdb_spark.operators.extract import _PdfLexer

        with _pytest.raises(ValueError, match="hex"):
            _PdfLexer(b"<48454c").next_token()

    def test_page_tree_cycle_is_detected(self):
        import re as _re

        import pytest as _pytest

        from zdb_spark.operators.extract import (pdf_to_text,
                                                 pdf_write_simple)

        doc = pdf_write_simple("x")
        # make the page tree cyclic: the Page's Parent is already
        # 2 0 R; point Kids at the Pages node itself
        bad = doc.replace(b"/Kids [3 0 R]", b"/Kids [2 0 R]")
        with _pytest.raises(ValueError, match="cycle"):
            pdf_to_text(bad)


class TestPdfXrefStream:
    """PDF 1.5+ read path (round-13 verdict task 4): /Type /XRef
    cross-reference streams (ISO 32000-1 §7.5.8), /Type /ObjStm object
    streams (§7.5.7), PNG predictors, hybrid /XRefStm files, and the
    untrusted-bytes hardening (bounded inflate, strict xref rows)."""

    def test_roundtrip_matches_classic_writer(self):
        from zdb_spark.operators.extract import (pdf_to_text,
                                                 pdf_write_simple,
                                                 pdf_write_xref_stream)

        t = "hello (xref) streams\nsecond  line\n\nthird \\ line"
        classic = pdf_to_text(pdf_write_simple(t))
        assert pdf_to_text(pdf_write_xref_stream(t)) == classic
        assert pdf_to_text(
            pdf_write_xref_stream(t, compress=False)) == classic

    def test_fixture_really_uses_the_new_forms(self):
        from zdb_spark.operators.extract import pdf_write_xref_stream

        blob = pdf_write_xref_stream("hi")
        assert b"/Type /XRef" in blob
        assert b"/Type /ObjStm" in blob
        assert b"/Predictor 12" in blob
        assert b"/Index [0 5 5 3]" in blob       # multi-subsection
        assert b"\nxref\n" not in blob           # no classic table

    def test_png_unpredict_all_filters(self):
        # encode 3 rows of known bytes under each PNG filter and check
        # the decoder restores them (Colors=1, BPC=8, the xref shape)
        from zdb_spark.operators.extract import _png_unpredict

        rows = [bytes([5, 10, 20, 40]), bytes([7, 7, 7, 7]),
                bytes([255, 0, 128, 3])]
        cols = 4

        def paeth(a, b, c):
            pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
            return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

        for ft in range(5):
            enc = bytearray()
            prev = bytes(cols)
            for r in rows:
                enc.append(ft)
                for i in range(cols):
                    left = r[i - 1] if i else 0
                    up = prev[i]
                    ul = prev[i - 1] if i else 0
                    pred = {0: 0, 1: left, 2: up,
                            3: (left + up) >> 1,
                            4: paeth(left, up, ul)}[ft]
                    enc.append((r[i] - pred) & 0xFF)
                prev = r
            assert _png_unpredict(bytes(enc), cols) == b"".join(rows), ft

        import pytest as _pytest
        with _pytest.raises(ValueError, match="ragged"):
            _png_unpredict(b"\x00\x01", 4)
        with _pytest.raises(ValueError, match="unknown filter"):
            _png_unpredict(bytes([9, 0, 0, 0, 0]), 4)

    def test_malformed_classic_xref_row_is_loud(self):
        # a 19-byte row (single-byte EOL) must raise, not silently
        # misalign every subsequent row (round-13 advice)
        import pytest as _pytest

        from zdb_spark.operators.extract import (pdf_to_text,
                                                 pdf_write_simple)

        doc = pdf_write_simple("x")
        bad = doc.replace(b"0000000000 65535 f \n",
                          b"0000000000 65535 f\n", 1)
        with _pytest.raises(ValueError, match="xref row"):
            pdf_to_text(bad)

    def test_decompression_bomb_is_refused(self):
        # 64 MB of zeros compresses to ~64 KB; a small file's cap is
        # 4 MiB, so the inflate must stop and raise, not fill executor
        # memory (round-13 advice: untrusted crawl bytes)
        import zlib as _zlib

        import pytest as _pytest

        from zdb_spark.operators.extract import _Pdf, pdf_write_simple

        bomb = _zlib.compress(b"\x00" * (64 * 1024 * 1024), 9)
        pdf = _Pdf(pdf_write_simple("y"))       # tiny file -> 4 MiB cap
        with _pytest.raises(ValueError, match="bomb"):
            pdf.stream_data(
                ("stream", {"Filter": ("name", "FlateDecode"),
                            "Length": len(bomb)}, bomb))
        # a TRUNCATED stream is refused by the same guard (previously a
        # silent-partial risk with a raw zlib.error at best)
        ok = _zlib.compress(b"payload bytes", 6)
        with _pytest.raises(ValueError, match="truncated|bomb"):
            pdf.stream_data(
                ("stream", {"Filter": ("name", "FlateDecode"),
                            "Length": len(ok) - 4}, ok[:-4]))

    def test_hybrid_xrefstm_file(self):
        # classic table covering only object 0 + /XRefStm pointing at
        # the 1.5 writer's xref stream: every real object resolves
        # through the stream (§7.5.8.4)
        import re as _re

        from zdb_spark.operators.extract import (pdf_to_text,
                                                 pdf_write_xref_stream)

        doc = pdf_write_xref_stream("hybrid body text")
        m = list(_re.finditer(rb"startxref\s+(\d+)", doc[-2048:]))[-1]
        xref_stream_at = int(m.group(1))
        out = bytearray(doc)
        out += b"\n"
        classic_at = len(out)
        out += (b"xref\n0 1\n0000000000 65535 f \n"
                b"trailer\n<< /Size 8 /Root 1 0 R /XRefStm %d >>\n"
                b"startxref\n%d\n%%%%EOF" % (xref_stream_at, classic_at))
        assert pdf_to_text(bytes(out)) == "hybrid body text"

    def test_classic_free_defers_to_xrefstm(self):
        # hybrid rule: a FREE table entry must not shadow the stream's
        # live entry for the same object (hybrid writers hide
        # compressed objects from pre-1.5 readers exactly that way)
        import re as _re

        from zdb_spark.operators.extract import (pdf_to_text,
                                                 pdf_write_xref_stream)

        doc = pdf_write_xref_stream("shadow test")
        m = list(_re.finditer(rb"startxref\s+(\d+)", doc[-2048:]))[-1]
        xref_stream_at = int(m.group(1))
        out = bytearray(doc)
        out += b"\n"
        classic_at = len(out)
        # table marks objects 0-4 free (1-4 live in the ObjStm)
        rows = b"".join(b"0000000000 65535 f \n" for _ in range(5))
        out += (b"xref\n0 5\n" + rows
                + b"trailer\n<< /Size 8 /Root 1 0 R /XRefStm %d >>\n"
                b"startxref\n%d\n%%%%EOF" % (xref_stream_at, classic_at))
        assert pdf_to_text(bytes(out)) == "shadow test"

    def test_objstm_header_mismatch_is_loud(self):
        import pytest as _pytest

        from zdb_spark.operators.extract import (pdf_to_text,
                                                 pdf_write_xref_stream)

        # corrupt the ObjStm header pairs (uncompressed form): object 1
        # renumbered to 9 — xref says entry 0 holds object 1
        doc = pdf_write_xref_stream("mismatch", compress=False)
        bad = doc.replace(b"stream\n1 0 2 ", b"stream\n9 0 2 ", 1)
        assert bad != doc
        with _pytest.raises(ValueError, match="index mismatch"):
            pdf_to_text(bad)


class TestPdfFilters:
    """The five standard text-era stream filters (ISO 32000-1 §7.4):
    Flate (existing), LZW with EarlyChange + KwKwK, ASCIIHex, ASCII85,
    RunLength — each round-tripped against an independent encoder, with
    the module's loud-raise contract on malformed input."""

    def test_asciihex(self):
        from zdb_spark.operators.extract import _asciihex_decode

        assert _asciihex_decode(b"48 65 6C6C 6F>") == b"Hello"
        assert _asciihex_decode(b"48656") == b"He`"       # odd pad with 0
        import pytest as _pytest
        with _pytest.raises(ValueError, match="non-hex"):
            _asciihex_decode(b"4z>")

    def test_ascii85(self):
        import base64

        from zdb_spark.operators.extract import _ascii85_decode

        for payload in (b"", b"x", b"Hello, world!",
                        b"\x00\x00\x00\x00" * 3 + b"tail",
                        bytes(range(256))):
            enc = base64.a85encode(payload) + b"~>"
            assert _ascii85_decode(enc) == payload

    def test_runlength(self):
        from zdb_spark.operators.extract import _rle_decode

        # 2 literals, a 5-byte repeat of 'A', 1 literal, EOD
        enc = bytes([1]) + b"ab" + bytes([252]) + b"A" + bytes([0]) \
            + b"z" + bytes([128])
        assert _rle_decode(enc) == b"ab" + b"A" * 5 + b"z"
        import pytest as _pytest
        with _pytest.raises(ValueError, match="EOD"):
            _rle_decode(bytes([1]) + b"ab")

    @staticmethod
    def _lzw_encode(data: bytes, early: int = 1) -> bytes:
        # independent MSB-first LZW encoder (TIFF variant) for the
        # round-trip: Clear, codes, EOD; width grows `early` early
        out_bits = []
        width = 9

        def emit(code):
            out_bits.extend((code >> (width - 1 - i)) & 1
                            for i in range(width))

        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        emit(256)                                  # ClearTable
        w = b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
                continue
            emit(table[w])
            table[wc] = next_code
            next_code += 1
            if next_code + early - 1 >= (1 << width) and width < 12:
                width += 1
            w = bytes([ch])
        if w:
            emit(table[w])
        emit(257)                                  # EOD
        while len(out_bits) % 8:
            out_bits.append(0)
        return bytes(int("".join(map(str, out_bits[i:i + 8])), 2)
                     for i in range(0, len(out_bits), 8))

    def test_lzw_roundtrip(self):
        from zdb_spark.operators.extract import _lzw_decode

        cases = [b"", b"A", b"TOBEORNOTTOBEORTOBEORNOT",
                 b"aaaaaaaaaaaaaaaaaaaaaaa",          # KwKwK chains
                 bytes(range(256)) * 3,
                 b"the quick brown fox " * 100]       # width growth
        for payload in cases:
            enc = self._lzw_encode(payload)
            assert _lzw_decode(enc, cap=1 << 20) == payload, payload[:20]

    def test_lzw_bomb_and_garbage_are_loud(self):
        import pytest as _pytest

        from zdb_spark.operators.extract import _lzw_decode

        big = self._lzw_encode(b"a" * 100_000)
        with _pytest.raises(ValueError, match="cap"):
            _lzw_decode(big, cap=1000)
        with _pytest.raises(ValueError, match="bad code|EOD"):
            _lzw_decode(b"\xff\xff\xff\xff", cap=1 << 20)

    def test_filters_through_the_document_path(self):
        # splice each filter into a real single-page document: encode
        # the content stream by hand, point /Filter at it, re-run the
        # full pdf_to_text walk
        import base64

        from zdb_spark.operators.extract import pdf_to_text, \
            pdf_write_simple

        text = "filtered body text\nsecond line"
        doc = pdf_write_simple(text, compress=False)
        start = doc.index(b"5 0 obj")
        s0 = doc.index(b"stream\n", start) + len(b"stream\n")
        s1 = doc.index(b"\nendstream", s0)
        content = doc[s0:s1]

        def splice(enc: bytes, fname: str) -> bytes:
            # keep offsets valid: object 5 is written LAST, so only
            # the trailer's startxref shifts — rebuild it
            body = (doc[:start]
                    + b"5 0 obj\n<< /Length %d /Filter /%s >>\nstream\n"
                    % (len(enc), fname.encode())
                    + enc + b"\nendstream\nendobj\n")
            xref_at = len(body)
            import re as _re
            m = _re.search(rb"xref\n0 (\d+)\n", doc)
            nobj = int(m.group(1))
            rows = [b"0000000000 65535 f \n"]
            # objects 1-4 keep their original offsets; 5 moved? no —
            # object 5 *started* at `start` and still does
            offs = {}
            for n in range(1, nobj):
                mm = _re.search(rb"\n?%d 0 obj" % n, doc)
                offs[n] = mm.start() + (1 if doc[mm.start():mm.start()+1]
                                        == b"\n" else 0)
            for n in range(1, nobj):
                rows.append(b"%010d 00000 n \n" % offs[n])
            body += (b"xref\n0 %d\n" % nobj + b"".join(rows)
                     + b"trailer\n<< /Size %d /Root 1 0 R >>\n"
                     b"startxref\n%d\n%%%%EOF" % (nobj, xref_at))
            return body

        expect = "filtered body text\nsecond line"
        hexed = content.hex().encode() + b">"
        assert pdf_to_text(splice(hexed, "ASCIIHexDecode")) == expect
        a85 = base64.a85encode(content) + b"~>"
        assert pdf_to_text(splice(a85, "ASCII85Decode")) == expect
        lzw = self._lzw_encode(content)
        assert pdf_to_text(splice(lzw, "LZWDecode")) == expect


class TestMarkdownToText:
    """Markdown extraction (operators/extract.py:markdown_to_text):
    chrome stripping, fence suppression, inline unwrapping with
    CommonMark word-boundary underscores, HTML block routing."""

    def test_full_contract(self):
        from zdb_spark.operators.extract import markdown_to_text

        doc = ("# Title here\n\n"
               "Some **bold** and *italic* and `code span` text.\n\n"
               "```python\ndef hidden(): pass\n```\n\n"
               "- item one\n"
               "- item [two](http://x.com) linked\n"
               "1. numbered ![alt text](img.png)\n\n"
               "> quoted line\n\n"
               "| a | b |\n|---|---|\n| c | d |\n\n"
               "---\n\n"
               "[ref]: http://example.com\n\n"
               "    indented code block\n\n"
               "Final ~~para~~ text.")
        assert markdown_to_text(doc) == (
            "Title here\n"
            "Some bold and italic and code span text.\n"
            "item one\nitem two linked\nnumbered alt text\n"
            "quoted line\na b\nc d\nFinal para text.")

    def test_snake_case_survives_word_boundary_emphasis(self):
        from zdb_spark.operators.extract import markdown_to_text

        assert markdown_to_text("snake_case and a_var_name here") == \
            "snake_case and a_var_name here"
        assert markdown_to_text("_real_ emphasis and __strong__") == \
            "real emphasis and strong"

    def test_unterminated_fence_suppresses_rest(self):
        from zdb_spark.operators.extract import markdown_to_text

        assert markdown_to_text("before\n```\ncode...\nmore") == "before"

    def test_html_blocks_route_through_html_to_text(self):
        from zdb_spark.operators.extract import markdown_to_text

        doc = "intro\n<p>para &amp; entity</p>\noutro"
        assert markdown_to_text(doc) == "intro\npara & entity\noutro"

    def test_nested_chrome_and_plain_passthrough(self):
        from zdb_spark.operators.extract import markdown_to_text

        assert markdown_to_text("> - nested   quote item") == \
            "nested quote item"
        assert markdown_to_text("plain  text\n\nonly") == \
            "plain text\nonly"

    def test_spark_column_with_nulls(self, spark):
        from zdb_spark.operators.extract import extract_markdown

        df = spark.createDataFrame(
            [(1, "# H\n\nbody *here*"), (2, None)],
            "id long, md string")
        got = {r.id: r.text for r in
               extract_markdown(df, "md").collect()}
        assert got == {1: "H\nbody here", 2: None}


class TestDocxToText:
    """DOCX extraction (operators/extract.py:docx_to_text): ZIP +
    word/document.xml walk — runs concatenate without separators, tabs
    become spaces, br/cr and paragraph ends become lines, loud raises
    on OLE/malformed containers."""

    def test_roundtrip_and_xml_escapes(self):
        from zdb_spark.operators.extract import (docx_to_text,
                                                 docx_write_simple)

        t = "Hello  world\nsecond <line> & \"such\"\n\ntail"
        assert docx_to_text(docx_write_simple(t)) == \
            "Hello world\nsecond <line> & \"such\"\ntail"
        assert docx_to_text(docx_write_simple("")) == ""

    def test_runs_tabs_breaks_and_tables(self):
        import io
        import zipfile

        from zdb_spark.operators.extract import docx_to_text

        ns = ("http://schemas.openxmlformats.org/wordprocessingml/"
              "2006/main")
        body = (
            # one paragraph, word split across runs + a tab + a br
            '<w:p><w:r><w:t>Hel</w:t></w:r><w:r><w:t>lo</w:t></w:r>'
            '<w:r><w:tab/><w:t>next</w:t><w:br/><w:t>after</w:t>'
            '</w:r></w:p>'
            # a 1x2 table: each cell paragraph is its own line
            '<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell a</w:t></w:r>'
            '</w:p></w:tc><w:tc><w:p><w:r><w:t>cell b</w:t></w:r>'
            '</w:p></w:tc></w:tr></w:tbl>')
        doc = (f'<w:document xmlns:w="{ns}"><w:body>{body}</w:body>'
               f'</w:document>')
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("word/document.xml", doc)
        assert docx_to_text(buf.getvalue()) == \
            "Hello next\nafter\ncell a\ncell b"

    def test_loud_raises(self):
        import pytest as _pytest

        from zdb_spark.operators.extract import docx_to_text

        with _pytest.raises(ValueError, match="ZIP"):
            docx_to_text(b"\xd0\xcf\x11\xe0 ole compound file")
        with _pytest.raises(ValueError, match="malformed docx"):
            docx_to_text(b"PK\x03\x04 truncated junk")
        import io
        import zipfile
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("word/document.xml", "<w:document not xml")
        with _pytest.raises(ValueError, match="xml"):
            docx_to_text(buf.getvalue())

    def test_spark_column_with_nulls(self, spark):
        from zdb_spark.operators.extract import (docx_write_simple,
                                                 extract_docx)

        rows = [(1, bytearray(docx_write_simple("doc one"))), (2, None)]
        df = spark.createDataFrame(rows, "id long, docx binary")
        got = {r.id: r.text for r in extract_docx(df).collect()}
        assert got == {1: "doc one", 2: None}


class TestRound14ReviewFixes:
    """Regression pins for the round-14 post-close review findings."""

    def test_multiline_script_block_is_suppressed(self):
        # finding: the eager per-'>' flush leaked <script> bodies into
        # prose — HTML blocks now buffer through the next blank line
        from zdb_spark.operators.extract import markdown_to_text

        doc = "intro text\n<script>\nvar secret = 1;\n</script>\nafter"
        # the block runs to EOF: code suppressed, trailing prose kept
        assert markdown_to_text(doc) == "intro text\nafter"
        # with the blank-line block boundary, prose resumes after it
        doc2 = ("intro\n<script>\nvar s = 1;\n</script>\n\n"
                "after prose")
        assert markdown_to_text(doc2) == "intro\nafter prose"
        # a style block with following markup still extracts its prose
        doc3 = "<style>p{x}</style>\n<p>kept</p>\n\ntail"
        assert markdown_to_text(doc3) == "kept\ntail"

    def test_indented_code_requires_blank_line(self):
        # finding: lazily-wrapped prose indented 4+ mid-paragraph was
        # deleted as code; CommonMark says indented code cannot
        # interrupt a paragraph
        from zdb_spark.operators.extract import markdown_to_text

        assert markdown_to_text("para starts\n    wrapped hard line") \
            == "para starts\nwrapped hard line"
        # after a blank line it IS code — and the block spans until a
        # non-indented, non-blank line
        doc = "para\n\n    code 1\n\n    code 2\nafter"
        assert markdown_to_text(doc) == "para\nafter"

    def test_pdf_objstm_cycle_is_loud(self):
        import pytest as _pytest

        from zdb_spark.operators.extract import _Pdf, pdf_write_simple

        pdf = _Pdf(pdf_write_simple("x"))
        pdf._in_objstm[6] = (6, 0)             # ObjStm stored in itself
        pdf._offsets.pop(6, None)
        with _pytest.raises(ValueError, match="cycle"):
            pdf.resolve_obj(("ref", 6))
        # two-node cycle through the container chain
        pdf2 = _Pdf(pdf_write_simple("x"))
        pdf2._in_objstm[8] = (9, 0)
        pdf2._in_objstm[9] = (8, 0)
        with _pytest.raises(ValueError, match="cycle"):
            pdf2.resolve_obj(("ref", 8))

    def test_pdf_self_referencing_length_is_loud(self):
        import pytest as _pytest

        from zdb_spark.operators.extract import pdf_to_text, \
            pdf_write_simple

        # make object 5's /Length point at object 5 itself; a 12000+
        # char body gives a 5-digit Length literal so the "5 0 R"
        # swap is byte-for-byte and every xref offset stays valid
        doc = pdf_write_simple("x" * 12000, compress=False)
        import re as _re
        m = _re.search(rb"<< /Length (\d+) >>", doc)
        lit = m.group(1)
        assert len(lit) == 5, lit
        bad = doc[:m.start(1)] + b"5 0 R" + doc[m.end(1):]
        with _pytest.raises(ValueError, match="cycle"):
            pdf_to_text(bad)


class TestRound15AdviceFixes:
    """Regression pins for the round-14 ADVICE.md findings (fixed in
    round 15): CommonMark closing-fence length, lazy-continuation
    chrome gating, and the xref-stream /W zero-offset-width refusal."""

    def test_long_fence_embeds_short_fence_examples(self):
        # finding: fence_mark was normalized to 3 chars, so a ````
        # fence embedding a ``` example was closed by the inner run —
        # code leaked into prose AND the real closer ate later prose
        from zdb_spark.operators.extract import markdown_to_text

        doc = ("before\n\n"
               "````markdown\n"
               "example:\n"
               "```\ncode\n```\n"
               "````\n\n"
               "after")
        assert markdown_to_text(doc) == "before\nafter"
        # tilde form, and a LONGER closing run still closes
        doc2 = "a\n\n~~~~text\n~~~\nstill code\n~~~~~\n\nb"
        assert markdown_to_text(doc2) == "a\nb"
        # a shorter run or the other character never closes
        doc3 = "x\n\n````\n```\n~~~~\ncode\n"
        assert markdown_to_text(doc3) == "x"
        # a run with trailing text is content, not a closer
        doc4 = "x\n\n````\n```` not a closer\ncode\n````\n\ny"
        assert markdown_to_text(doc4) == "x\ny"

    def test_lazy_continuation_keeps_ordered_chrome(self):
        # finding: _MD_LINE_CHROME stripped number+period / '- ' / '> '
        # from EVERY line; CommonMark treats a line under a paragraph
        # as a lazy continuation unless the marker can interrupt
        from zdb_spark.operators.extract import markdown_to_text

        assert markdown_to_text("He was born in\n1999. That was it.") \
            == "He was born in\n1999. That was it."
        # markers that CAN interrupt a paragraph still strip:
        # blockquote, non-empty bullet, and an ordered item starting 1
        assert markdown_to_text("wrapped prose\n> a quote") == \
            "wrapped prose\na quote"
        assert markdown_to_text("wrapped prose\n- a bullet") == \
            "wrapped prose\na bullet"
        assert markdown_to_text("wrapped prose\n1. new list") == \
            "wrapped prose\nnew list"
        # tight lists keep stripping item 2+ (list context, not a
        # paragraph continuation: the previous line was chromed)
        assert markdown_to_text("1. one\n2. two\n3. three") == \
            "one\ntwo\nthree"
        assert markdown_to_text("para\n\n1. one\n2. two") == \
            "para\none\ntwo"

    def test_xref_stream_zero_offset_width_is_loud(self):
        import pytest as _pytest

        from zdb_spark.operators.extract import (pdf_to_text,
                                                 pdf_write_xref_stream)

        doc = pdf_write_xref_stream("x")
        assert b"/W [1 4 2]" in doc
        bad = doc.replace(b"/W [1 4 2]", b"/W [1 0 2]")
        with _pytest.raises(ValueError, match="/W"):
            pdf_to_text(bad)
