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
