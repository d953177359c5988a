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
        # xref streams (PDF 1.5+): startxref points at an obj, not 'xref'
        doc = pdf_write_simple("x")
        m = list(_re.finditer(rb"startxref\s+(\d+)", doc))[-1]
        patched = doc[:m.start(1)] + b"0000000009" + doc[m.end(1):]
        with _pytest.raises(NotImplementedError, match="STREAM"):
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
