"""Document text EXTRACTION — the stage before every text operator in
this repo: a crawled corpus arrives as markup (HTML above all), and
quality scoring / dedup / tokenization all assume clean text.

``html_to_text`` is a stdlib-only extractor (html.parser — tolerant of
malformed markup, the crawl reality) with the standard C4/trafilatura-
class contract:

- ``<script>/<style>/<noscript>/<template>`` subtrees are dropped
  entirely (code is not prose);
- BLOCK-level boundaries (p, div, li, headings, title, br, table
  cells, ...) become newlines; inline markup (a, b, span, em, ...)
  vanishes without breaking the sentence around it;
- character/entity references decode (``&amp;`` → ``&``) — html.parser
  delivers decoded text to the handler;
- whitespace inside a block collapses to single spaces, empty blocks
  vanish — markup indentation must not leak into the corpus.

The Spark form (``extract_html``) is an Arrow-batched pandas UDF: this
is per-row Python by necessity (a streaming tag parser has no Catalyst
form), exactly the multimodal-decode slot of the UDF ladder — batch
transfer via Arrow, rows independent, embarrassingly parallel across
executors.  At 100 TB the extractor is scan-bound and stateless: no
shuffle, no driver state, output strictly smaller than input.
"""

from __future__ import annotations

from html.parser import HTMLParser
from io import StringIO

from pyspark.sql import DataFrame, functions as F

__all__ = ["html_to_text", "extract_html"]

_SKIP = {"script", "style", "noscript", "template"}
_BLOCK = {"html", "head", "body", "title", "p", "div", "nav", "li",
          "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6", "table",
          "thead", "tbody", "tr", "td", "th", "section", "article",
          "header", "footer", "aside", "main", "pre", "blockquote",
          "figure", "figcaption", "form", "fieldset", "hr", "br",
          "dl", "dt", "dd"}


class _TextExtractor(HTMLParser):
    """Streaming extractor: block tags flush the line buffer, skip
    subtrees suppress data, everything else is inline."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._lines: list[str] = []
        self._buf = StringIO()
        self._skip = 0

    def _flush(self) -> None:
        line = " ".join(self._buf.getvalue().split())
        if line:
            self._lines.append(line)
        self._buf = StringIO()

    def handle_starttag(self, tag, attrs) -> None:
        if tag in _SKIP:
            self._skip += 1
        elif tag in _BLOCK:
            self._flush()

    def handle_startendtag(self, tag, attrs) -> None:
        if tag in _BLOCK:            # <br/>, <hr/>
            self._flush()

    def handle_endtag(self, tag) -> None:
        if tag in _SKIP:
            # tolerate stray close tags: never go negative
            self._skip = max(0, self._skip - 1)
        elif tag in _BLOCK:
            self._flush()

    def handle_data(self, data) -> None:
        if not self._skip and data:
            self._buf.write(data)

    def text(self) -> str:
        self._flush()
        return "\n".join(self._lines)


def html_to_text(html: str) -> str:
    """Extract clean text from one HTML document (see module
    docstring for the contract).  Malformed markup is handled the way
    html.parser handles it — leniently; an unclosed ``<script>``
    suppresses the rest of the document, which for corpus purposes is
    the safe direction (code never leaks into training text)."""
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return p.text()


def extract_html(df: DataFrame, html_col: str = "html",
                 out_col: str = "text") -> DataFrame:
    """``html_to_text`` over a DataFrame column (Arrow-batched pandas
    UDF; NULL markup stays NULL).  Rows are independent — the operator
    adds no shuffle and holds no state."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _extract(s):
        return s.map(lambda h: None if h is None else html_to_text(h))

    # explicit Series->Series hints (not the module's stringized future
    # annotations, which pyspark's eval-type inference can't resolve
    # against a function-local pandas import)
    _extract.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = pandas_udf(_extract, "string")
    return df.withColumn(out_col, udf(F.col(html_col)))
