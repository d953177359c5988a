"""Document text EXTRACTION — the stage before every text operator in
this repo: a crawled corpus arrives as markup or containers (HTML above
all, then PDF, Markdown, and Office documents), and quality scoring /
dedup / tokenization all assume clean text.  Four extractors share one
contract — whitespace-normalized prose lines, blanks dropped, non-prose
subtrees (scripts, code fences, styles) suppressed, unsupported or
encrypted containers refused LOUDLY:

- ``html_to_text`` — stdlib html.parser streaming extractor;
- ``markdown_to_text`` — CommonMark-ish chrome stripper;
- ``pdf_to_text`` — ISO 32000 subset (classic + 1.5 xref forms);
- ``docx_to_text`` — OOXML word/document.xml walk.

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

import re
import zlib
from html.parser import HTMLParser
from io import StringIO

from pyspark.sql import DataFrame, functions as F

__all__ = ["html_to_text", "extract_html",
           "markdown_to_text", "extract_markdown",
           "docx_to_text", "docx_write_simple", "extract_docx",
           "pdf_to_text", "pdf_write_simple", "pdf_write_xref_stream",
           "extract_pdf"]

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

    def result_text(self) -> str:
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
    return p.result_text()


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


# ---------------------------------------------------------------------- #
# Markdown text extraction (CommonMark-ish subset, stdlib re only)        #
# ---------------------------------------------------------------------- #
# The third major crawl text shape after HTML and PDF (READMEs, docs
# sites, forum exports).  The extractor STRIPS markup and keeps prose:
# code fences and their contents drop entirely (code is not prose — the
# html_to_text script-tag rule), inline code keeps its text, links keep
# the label and lose the URL, images drop to their alt text, emphasis /
# heading / blockquote / list / table chrome is removed, HTML blocks
# route through html_to_text.  Line-oriented by design: one output line
# per prose line, whitespace-normalized, blanks dropped — the same
# contract as the other extractors, so the same closed-form oracle
# pattern applies.

# Underscore emphasis requires word boundaries (CommonMark §6.2: `_`
# cannot open/close emphasis inside a word) — snake_case identifiers
# in prose must pass through untouched.  `*` keeps the permissive
# intra-word form, as CommonMark allows.
_MD_INLINE = [
    (re.compile(r"!\[([^\]]*)\]\([^)]*\)"), r"\1"),   # image -> alt
    (re.compile(r"\[([^\]]*)\]\([^)]*\)"), r"\1"),    # link -> label
    (re.compile(r"\[([^\]]*)\]\[[^\]]*\]"), r"\1"),   # ref link -> label
    (re.compile(r"`([^`]*)`"), r"\1"),                # inline code
    (re.compile(r"\*\*\*(.+?)\*\*\*"), r"\1"),        # bold italic
    (re.compile(r"(?<![A-Za-z0-9])___(?!\s)(.+?)(?<!\s)___"
                r"(?![A-Za-z0-9])"), r"\1"),
    (re.compile(r"\*\*(.+?)\*\*"), r"\1"),            # bold
    (re.compile(r"(?<![A-Za-z0-9])__(?!\s)(.+?)(?<!\s)__"
                r"(?![A-Za-z0-9])"), r"\1"),
    (re.compile(r"\*(.+?)\*"), r"\1"),                # italic
    (re.compile(r"(?<![A-Za-z0-9])_(?!\s)(.+?)(?<!\s)_"
                r"(?![A-Za-z0-9])"), r"\1"),
    (re.compile(r"~~(.+?)~~"), r"\1"),                # strikethrough
]
_MD_LINE_CHROME = re.compile(
    r"^(?:\s{0,3}(?:#{1,6}\s+|>\s?|[-*+]\s+|\d{1,9}[.)]\s+))+")
# Mid-paragraph (lazy continuation) variant: only the markers
# CommonMark lets INTERRUPT a paragraph — ATX headings, blockquotes,
# non-empty bullet items, and ordered items starting at 1 (spec §5.3).
# A continuation line like "...born in\n1999. That was..." keeps its
# leading "1999." instead of being silently de-chromed.
_MD_LINE_CHROME_INTERRUPT = re.compile(
    r"^(?:\s{0,3}(?:#{1,6}\s+|>\s?|[-*+]\s+(?=\S)|1[.)]\s+(?=\S)))+")
_MD_RULE = re.compile(r"^\s{0,3}(?:-{3,}|\*{3,}|_{3,})\s*$")
_MD_TABLE_SEP = re.compile(r"^\s*\|?[\s:|-]+\|[\s:|-]*$")
_MD_REF_DEF = re.compile(r"^\s{0,3}\[[^\]]+\]:\s+\S+")


def markdown_to_text(md: str) -> str:
    """Extract prose from one Markdown document (see the subset
    contract above).  Unterminated code fences suppress the rest of
    the document — the safe direction for training text, matching
    html_to_text's unclosed-``<script>`` behavior.  An HTML block
    (a line opening with a tag) buffers through the NEXT BLANK LINE
    before routing through html_to_text (the CommonMark type-6 block
    boundary) — flushing any earlier would hand ``<script>`` bodies to
    the prose path line-by-line and leak code into training text.
    Indented code blocks require the CommonMark preceding blank line
    (indented code cannot interrupt a paragraph), so lazily-wrapped
    prose survives; a 4-space continuation paragraph inside a list
    after a blank line is still read as code — the documented
    limitation of line-oriented parsing."""
    lines: list[str] = []
    in_fence = False
    fence_mark = ""
    in_html = False
    in_code_indent = False
    prev_blank = True                          # doc start = block start
    prev_plain = False      # previous line was chrome-free paragraph text
    html_buf: list[str] = []

    def flush_html():
        if html_buf:
            got = html_to_text("\n".join(html_buf))
            lines.extend(got.split("\n") if got else [])
            html_buf.clear()

    for raw in md.split("\n"):
        stripped = raw.strip()
        if in_html:
            if stripped == "":
                flush_html()
                in_html = False
                prev_blank = True
            else:
                html_buf.append(raw)
            continue
        m = re.match(r"^(```+|~~~+)", stripped)
        if m:
            run = m.group(1)
            if not in_fence:
                # record the ACTUAL opening run: the closing fence must
                # be the same character repeated at least that many
                # times and nothing else (CommonMark closing-fence
                # rule) — a ````-opened fence embedding ``` examples
                # stays open through them.
                in_fence, fence_mark = True, run
            elif (run[0] == fence_mark[0] and len(run) >= len(fence_mark)
                    and stripped == run):
                in_fence = False
            prev_blank = prev_plain = False    # fences close paragraphs
            continue
        if in_fence:
            continue
        if in_code_indent:
            if raw.startswith("    ") or stripped == "":
                prev_blank = stripped == ""
                continue                       # still inside the block
            in_code_indent = False             # fall through to prose
        if re.match(r"^</?\w", stripped):
            in_html = True
            prev_plain = False                 # HTML block boundary
            html_buf.append(raw)
            continue
        if stripped == "":
            prev_blank = True
            continue
        was_blank, prev_blank = prev_blank, False
        if (_MD_RULE.match(stripped) or _MD_TABLE_SEP.match(raw)
                or _MD_REF_DEF.match(raw)):
            prev_plain = False                 # these close paragraphs
            continue
        # Chrome stripping is context-gated: a line directly under a
        # plain paragraph line is a LAZY CONTINUATION candidate, so only
        # the markers CommonMark lets interrupt a paragraph strip there
        # ("...born in\n1999. That was..." keeps its leading "1999.").
        # Everywhere else (block start after a blank, or continuing a
        # tight list / heading / quote) the full chrome rule applies.
        line = (_MD_LINE_CHROME_INTERRUPT if prev_plain and not was_blank
                else _MD_LINE_CHROME).sub("", raw)
        if was_blank and raw.startswith("    ") and line == raw:
            in_code_indent = True              # indented code block
            prev_plain = False
            continue
        prev_plain = line == raw               # no chrome = paragraph text
        for pat, rep in _MD_INLINE:
            line = pat.sub(rep, line)
        line = line.replace("|", " ")          # table cell walls
        line = " ".join(line.split())
        if line:
            lines.append(line)
    flush_html()
    return "\n".join(lines)


def extract_markdown(df: DataFrame, md_col: str = "md",
                     out_col: str = "text") -> DataFrame:
    """``markdown_to_text`` over a DataFrame column (Arrow-batched
    pandas UDF; NULL stays NULL).  Rows independent — no shuffle, no
    state; the same slot as extract_html/extract_pdf."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _extract(s):
        return s.map(lambda m: None if m is None
                     else markdown_to_text(m))

    _extract.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = pandas_udf(_extract, "string")
    return df.withColumn(out_col, udf(F.col(md_col)))


# ---------------------------------------------------------------------- #
# DOCX text extraction (OOXML / ECMA-376 subset, stdlib zipfile + etree)  #
# ---------------------------------------------------------------------- #
# The dominant "office document" shape in a crawl.  A .docx is a ZIP
# with the body at word/document.xml; prose lives in <w:t> runs inside
# <w:p> paragraphs.  The extractor walks paragraphs in document order:
# runs concatenate WITHOUT separators (a word may span runs —
# formatting boundaries are not token boundaries), <w:tab> becomes a
# space, <w:br> and paragraph ends become newlines, table cells
# (<w:tc>) emit their paragraphs like any other (one line each — the
# html_to_text table-cell rule), and everything else (styles, props,
# drawings, fields) is ignored.  Same line discipline as the other
# extractors: whitespace-normalized lines, blanks dropped.  Encrypted
# (non-zip OLE) and malformed containers raise loudly.

_DOCX_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def docx_to_text(payload: bytes) -> str:
    """Extract prose from one .docx (see the subset contract above)."""
    import io
    import zipfile
    from xml.etree import ElementTree

    if payload[:2] != b"PK":
        raise ValueError(
            "not a docx: not a ZIP container (OLE/encrypted .doc "
            "streams are refused, never guessed at)")
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        with zf.open("word/document.xml") as f:
            root = ElementTree.parse(f).getroot()
    except (zipfile.BadZipFile, KeyError) as exc:
        raise ValueError(f"malformed docx: {exc}") from None
    except ElementTree.ParseError as exc:
        raise ValueError(f"malformed docx xml: {exc}") from None

    lines: list[str] = []
    for para in root.iter(f"{_DOCX_NS}p"):
        buf: list[str] = []
        for node in para.iter():
            tag = node.tag
            if tag == f"{_DOCX_NS}t":
                buf.append(node.text or "")
            elif tag == f"{_DOCX_NS}tab":
                buf.append(" ")
            elif tag in (f"{_DOCX_NS}br", f"{_DOCX_NS}cr"):
                buf.append("\n")
        for piece in "".join(buf).split("\n"):
            line = " ".join(piece.split())
            if line:
                lines.append(line)
    return "\n".join(lines)


def docx_write_simple(text: str) -> bytes:
    """Minimal valid .docx carrying ``text`` (one ``<w:p>`` per input
    line) — the fixture encoder for the round-trip gate; opens in any
    OOXML consumer.  ``docx_to_text(docx_write_simple(t))`` returns the
    whitespace-normalized non-empty lines of ``t``."""
    import io
    import zipfile
    from xml.sax.saxutils import escape

    ns = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    paras = "".join(
        f"<w:p><w:r><w:t xml:space=\"preserve\">{escape(line)}</w:t>"
        f"</w:r></w:p>"
        for line in text.split("\n"))
    document = (f"<?xml version=\"1.0\" encoding=\"UTF-8\" "
                f"standalone=\"yes\"?>"
                f"<w:document xmlns:w=\"{ns}\"><w:body>{paras}"
                f"</w:body></w:document>")
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Default Extension="rels" ContentType="application/'
        'vnd.openxmlformats-package.relationships+xml"/>'
        '<Override PartName="/word/document.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.'
        'wordprocessingml.document.main+xml"/></Types>')
    rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/'
            'officeDocument" Target="word/document.xml"/>'
            '</Relationships>')
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", rels)
        zf.writestr("word/document.xml", document)
    return out.getvalue()


def extract_docx(df: DataFrame, docx_col: str = "docx",
                 out_col: str = "text") -> DataFrame:
    """``docx_to_text`` over a binary DataFrame column (Arrow-batched
    pandas UDF; NULL stays NULL).  Rows independent — no shuffle, no
    state; the extractor UDF slot."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _extract(s):
        return s.map(lambda b: None if b is None
                     else docx_to_text(bytes(b)))

    _extract.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = pandas_udf(_extract, "string")
    return df.withColumn(out_col, udf(F.col(docx_col)))


# ---------------------------------------------------------------------- #
# PDF text extraction (ISO 32000-1 subset, stdlib+zlib only)              #
# ---------------------------------------------------------------------- #
# The second-most-common document container in a web crawl after HTML.
# Scope (the honest-subset contract of the other from-scratch codecs —
# jpeg.py, multimodal.py): classic cross-reference TABLES, PDF 1.5+
# cross-reference STREAMS (/Type /XRef, ISO 32000-1 §7.5.8) and object
# streams (/Type /ObjStm, §7.5.7) including hybrid-reference files
# (/XRefStm), indirect objects, the /Root -> /Pages -> /Kids page tree,
# page /Contents (single stream or array), the five standard text-era
# filters — FlateDecode and LZWDecode (both with PNG predictors, the
# xref-stream default in the wild, §7.4.4.4), ASCIIHexDecode,
# ASCII85Decode, RunLengthDecode — literal strings with escape / octal
# sequences and hex strings, and the text-showing operators Tj ' " TJ
# inside BT/ET with Td/TD/T* treated as line breaks.  Out of scope,
# each with a LOUD raise: encryption (/Encrypt), image filters
# (DCT/JBIG2/JPX/CCITT — rasters, not text), and TIFF predictor 2 —
# the arithmetic-JPEG pattern: a wrong-text silent fallback would be
# worse than a refusal.  Glyph-to-unicode is the identity of the string
# bytes (standard-encoding Latin text) — CID/Type0 composite fonts
# show up as their raw bytes, the same best-effort every
# non-font-rendering extractor makes.

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _PdfLexer:
    """Token stream over a PDF object region: names, numbers, strings
    (decoded to bytes), hex strings, dict/array delimiters, keywords."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.d = data
        self.p = pos

    def _skip_ws(self) -> None:
        d, p = self.d, self.p
        while p < len(d):
            c = d[p:p + 1]
            if c in b"%":                       # comment to EOL
                while p < len(d) and d[p] not in b"\r\n":
                    p += 1
            elif c in _WS:
                p += 1
            else:
                break
        self.p = p

    def peek_raw(self, n: int) -> bytes:
        self._skip_ws()
        return self.d[self.p:self.p + n]

    def next_token(self):
        self._skip_ws()
        d, p = self.d, self.p
        if p >= len(d):
            return None
        c = d[p:p + 1]
        if c == b"/":                            # name
            q = p + 1
            while q < len(d) and d[q] not in _WS and d[q:q + 1] not in _DELIM:
                q += 1
            self.p = q
            return ("name", d[p + 1:q].decode("latin-1"))
        if c == b"(":                            # literal string
            return self._lit_string()
        if c == b"<":
            if d[p:p + 2] == b"<<":
                self.p = p + 2
                return ("<<", None)
            q = d.find(b">", p)                  # hex string
            if q < 0:
                raise ValueError(
                    "truncated pdf: unterminated hex string")
            hx = re.sub(rb"\s", b"", d[p + 1:q])
            if len(hx) % 2:
                hx += b"0"
            self.p = q + 1
            return ("str", bytes.fromhex(hx.decode("ascii")))
        if d[p:p + 2] == b">>":
            self.p = p + 2
            return (">>", None)
        if c in b"[]":
            self.p = p + 1
            return (c.decode(), None)
        if c in b"{}":
            self.p = p + 1
            return (c.decode(), None)
        # number or keyword
        q = p
        while q < len(d) and d[q] not in _WS and d[q:q + 1] not in _DELIM:
            q += 1
        if q == p:
            # stray delimiter (a lone ')' or '>' — unbalanced string,
            # binary inline-image bytes): consume ONE byte and surface
            # it as a keyword.  MUST make progress, or the caller's
            # token loop spins forever on the same byte.
            self.p = p + 1
            return ("kw", d[p:p + 1].decode("latin-1"))
        word = d[p:q]
        self.p = q
        try:
            if b"." in word:
                return ("num", float(word))
            return ("num", int(word))
        except ValueError:
            return ("kw", word.decode("latin-1"))

    _ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\x0c", b"(": b"(", b")": b")", b"\\": b"\\"}

    def _lit_string(self):
        d = self.d
        p = self.p + 1
        out, depth = bytearray(), 1
        while p < len(d):
            c = d[p:p + 1]
            if c == b"\\":
                nxt = d[p + 1:p + 2]
                if nxt and nxt in b"01234567":   # octal \ooo (1-3 digits)
                    # OCTAL digits only: '\8' is a backslash before a
                    # non-escape char, which ISO 32000 says to ignore
                    # (the _ESC fallthrough below) — int(_, 8) on '8'
                    # would abort the whole document
                    q = p + 1
                    oct_ = b""
                    while (q < len(d) and len(oct_) < 3
                           and d[q] in b"01234567"):
                        oct_ += d[q:q + 1]
                        q += 1
                    out.append(int(oct_, 8) & 0xFF)
                    p = q
                    continue
                if nxt in (b"\n", b"\r"):        # line continuation
                    p += 2
                    if nxt == b"\r" and d[p:p + 1] == b"\n":
                        p += 1
                    continue
                out += self._ESC.get(nxt, nxt)
                p += 2
                continue
            if c == b"(":
                depth += 1
            elif c == b")":
                depth -= 1
                if depth == 0:
                    self.p = p + 1
                    return ("str", bytes(out))
            out += c
            p += 1
        raise ValueError("truncated pdf: unterminated string")

    def next_object(self):
        """One complete object (dict/array/scalar/ref)."""
        tok = self.next_token()
        return self._object_from(tok)

    def _object_from(self, tok):
        if tok is None:
            raise ValueError("truncated pdf: expected object")
        kind, v = tok
        if kind == "<<":
            d = {}
            while True:
                t = self.next_token()
                if t is None:
                    raise ValueError("truncated pdf: unterminated dict")
                if t[0] == ">>":
                    return d
                if t[0] != "name":
                    raise ValueError(f"pdf dict key is {t[0]}, not a name")
                d[t[1]] = self.next_object()
            # not reached
        if kind == "[":
            arr = []
            while True:
                t = self.next_token()
                if t is None:
                    raise ValueError("truncated pdf: unterminated array")
                if t[0] == "]":
                    return arr
                arr.append(self._object_from(t))
        if kind == "num" and isinstance(v, int):
            # possible indirect reference "n g R"
            save = self.p
            t2 = self.next_token()
            if t2 and t2[0] == "num" and isinstance(t2[1], int):
                t3 = self.next_token()
                if t3 == ("kw", "R"):
                    return ("ref", v)
                self.p = save
                return v
            self.p = save
            return v
        if kind == "kw":
            return {"true": True, "false": False,
                    "null": None}.get(v, ("kw", v))
        if kind == "name":
            return ("name", v)
        return v


def _name_of(v):
    """Bare name string of a lexer name tuple (or pass-through)."""
    return v[1] if isinstance(v, tuple) and v and v[0] == "name" else v


def _asciihex_decode(data: bytes) -> bytes:
    """/ASCIIHexDecode (§7.4.2): hex pairs, whitespace ignored, '>'
    EOD; an odd final digit is padded with 0."""
    end = data.find(b">")
    hx = re.sub(rb"\s", b"", data[:end if end >= 0 else len(data)])
    if not re.fullmatch(rb"[0-9A-Fa-f]*", hx):
        raise ValueError("pdf ASCIIHexDecode: non-hex byte")
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii"))


def _ascii85_decode(data: bytes) -> bytes:
    """/ASCII85Decode (§7.4.3): base-85 groups, 'z' for a zero group,
    '~>' EOD.  stdlib a85decode implements exactly this alphabet."""
    import base64

    end = data.find(b"~>")
    body = data[:end if end >= 0 else len(data)]
    try:
        return base64.a85decode(body, ignorechars=b" \t\r\n\x0c\x00")
    except ValueError as exc:
        raise ValueError(f"pdf ASCII85Decode: {exc}") from None


def _rle_decode(data: bytes) -> bytes:
    """/RunLengthDecode (§7.4.5): length byte L — L<128 copies L+1
    literal bytes, L>128 repeats the next byte 257-L times, 128 is
    EOD."""
    out = bytearray()
    p = 0
    while p < len(data):
        n = data[p]
        p += 1
        if n == 128:
            return bytes(out)
        if n < 128:
            chunk = data[p:p + n + 1]
            if len(chunk) != n + 1:
                raise ValueError("pdf RunLengthDecode: truncated run")
            out += chunk
            p += n + 1
        else:
            if p >= len(data):
                raise ValueError("pdf RunLengthDecode: truncated run")
            out += data[p:p + 1] * (257 - n)
            p += 1
    raise ValueError("pdf RunLengthDecode: missing EOD marker")


def _lzw_decode(data: bytes, cap: int, early: int = 1) -> bytes:
    """/LZWDecode (§7.4.4, the TIFF variant): MSB-first variable-width
    codes starting at 9 bits, 256=ClearTable, 257=EOD; with
    ``EarlyChange`` (default 1) the width grows one code early.
    Output is capped like FlateDecode (bomb refusal)."""
    CLEAR, EOD = 256, 257
    out = bytearray()
    table: dict[int, bytes] = {}
    width, next_code = 9, 258
    prev: bytes | None = None
    bitbuf = bitcnt = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        bitcnt += 8
        while bitcnt >= width:
            code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
            bitcnt -= width
            if code == CLEAR:
                table.clear()
                width, next_code, prev = 9, 258, None
                continue
            if code == EOD:
                return bytes(out)
            if code < 256:
                entry = bytes([code])
            elif code in table:
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + prev[:1]           # KwKwK case
            else:
                raise ValueError(f"pdf LZWDecode: bad code {code}")
            out += entry
            if len(out) > cap:
                raise ValueError(
                    f"pdf LZWDecode output exceeds the decompression "
                    f"cap ({cap} bytes) — refusing a likely bomb")
            if prev is not None:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code + early >= (1 << width) and width < 12:
                    width += 1
            prev = entry
    raise ValueError("pdf LZWDecode: stream ended without EOD")


def _png_unpredict(data: bytes, columns: int) -> bytes:
    """Reverse the PNG row predictors (filter types 0-4) over
    Colors=1 / BitsPerComponent=8 rows — the /DecodeParms shape every
    real-world xref stream uses (ISO 32000-1 §7.4.4.4 delegates to the
    PNG spec).  Each stored row is 1 filter-type byte + `columns`
    filtered bytes."""
    rowlen = columns + 1
    if columns <= 0 or len(data) % rowlen:
        raise ValueError("pdf png predictor: ragged predicted data")
    out = bytearray()
    prev = bytearray(columns)
    for r in range(0, len(data), rowlen):
        ft = data[r]
        row = bytearray(data[r + 1:r + rowlen])
        if ft == 0:                                   # None
            pass
        elif ft == 1:                                 # Sub
            for i in range(1, columns):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif ft == 2:                                 # Up
            for i in range(columns):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:                                 # Average
            for i in range(columns):
                left = row[i - 1] if i else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:                                 # Paeth
            for i in range(columns):
                a = row[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(
                f"pdf png predictor: unknown filter type {ft}")
        out += row
        prev = row
    return bytes(out)


class _Pdf:
    def __init__(self, data: bytes) -> None:
        self.d = data
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, tuple[bytes, int, list]] = {}
        self._offsets: dict[int, int] = {}        # num -> byte offset
        self._in_objstm: dict[int, tuple[int, int]] = {}  # num -> (stm, i)
        self._read_xref()

    # -------------------- cross-reference parsing -------------------- #
    # Both forms feed a SECTION-local entry map which merges into the
    # global maps newest-section-first: an object freed by an
    # incremental update (classic type 'f' / stream type 0) must
    # tombstone the older section's live offset, or deleted content
    # would resurrect through /Prev.

    def _read_xref(self) -> None:
        d = self.d
        tail = d[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise ValueError("not a pdf: no startxref")
        dead: set[int] = set()
        pos = int(m.group(1))
        seen: set[int] = set()
        while pos and pos not in seen:
            seen.add(pos)
            if d[pos:pos + 4] == b"xref":
                trailer, entries = self._parse_classic_section(pos)
                # hybrid-reference file (§7.5.8.4): the /XRefStm stream
                # holds the compressed-object entries old readers can't
                # see.  Merge rule matching the major readers: a LIVE
                # table entry wins, but a free/absent table entry defers
                # to the stream (hybrid writers hide compressed objects
                # from pre-1.5 readers exactly that way).
                xs = trailer.get("XRefStm")
                if isinstance(xs, (int, float)):
                    _, stm_entries = self._parse_xref_stream(int(xs))
                    for num, ent in stm_entries.items():
                        if entries.get(num) in (None, "free"):
                            entries[num] = ent
            else:
                trailer, entries = self._parse_xref_stream(pos)
            if "Encrypt" in trailer:
                raise NotImplementedError("encrypted pdf is not supported")
            if not hasattr(self, "_trailer"):
                self._trailer = trailer
            for num, ent in entries.items():
                if (num in self._offsets or num in self._in_objstm
                        or num in dead):
                    continue                       # newest section wins
                if ent == "free":
                    dead.add(num)
                elif ent[0] == "objstm":
                    self._in_objstm[num] = (ent[1], ent[2])
                else:
                    self._offsets[num] = ent[1]
            prev = trailer.get("Prev")
            pos = int(prev) if isinstance(prev, (int, float)) else 0

    def _parse_classic_section(self, pos: int):
        """One classic `xref ... trailer <<...>>` section ->
        (trailer dict, {num: entry})."""
        d = self.d
        lex = _PdfLexer(d, pos + 4)
        entries: dict[int, object] = {}
        while True:
            t = lex.next_token()
            if t == ("kw", "trailer"):
                break
            if t is None:
                raise ValueError("truncated pdf: xref without trailer")
            if t[0] != "num":
                raise ValueError("malformed pdf xref")
            cnt_tok = lex.next_token()
            if cnt_tok is None or cnt_tok[0] != "num":
                raise ValueError("malformed pdf xref subsection")
            first, count = t[1], cnt_tok[1]
            lex._skip_ws()
            for i in range(count):
                row = d[lex.p:lex.p + 20]
                # strict 20-byte row shape (§7.5.4).  Some real-world
                # writers emit 19-byte rows (single-byte EOL); accepting
                # them would silently misalign every later row, so the
                # contract here is the module's loud raise.
                if not (len(row) == 20
                        and row[0:10].isdigit()
                        and row[10:11] == b" "
                        and row[11:16].isdigit()
                        and row[16:17] == b" "
                        and row[17:18] in b"nf"
                        and row[18:20] in (b" \r", b" \n", b"\r\n")):
                    raise ValueError("malformed pdf xref row")
                num = first + i
                if num not in entries:
                    if row[17:18] == b"n":
                        entries[num] = ("classic", int(row[0:10]))
                    else:
                        entries[num] = "free"
                lex.p += 20
        trailer = lex.next_object()
        return trailer, entries

    def _parse_xref_stream(self, pos: int):
        """One /Type /XRef stream object (§7.5.8) ->
        (stream dict [doubles as trailer], {num: entry})."""
        lex = _PdfLexer(self.d, pos)
        t1, t2, t3 = lex.next_token(), lex.next_token(), lex.next_token()
        if not (t1 and t1[0] == "num" and t3 == ("kw", "obj")):
            raise ValueError(f"malformed pdf xref at {pos}: neither a "
                             "classic table nor an xref stream object")
        info = lex.next_object()
        if _name_of(info.get("Type")) != "XRef":
            raise ValueError("pdf xref stream object is not /Type /XRef")
        raw = self._raw_stream_after(lex, info)
        data = self.stream_data(("stream", info, raw))
        # /W widths and /Index pairs are DIRECT objects by spec (the
        # xref machinery can't require xref lookups to parse itself)
        w = [int(x) for x in info["W"]]
        if len(w) != 3 or any(x < 0 for x in w) or sum(w) == 0:
            raise ValueError(f"malformed pdf xref stream /W {w}")
        if w[1] == 0:
            # a zero second width would store None as every type-1
            # offset / type-2 container number (§7.5.8 gives field 2 no
            # default) — resolving any object would then die with an
            # uncontractual TypeError instead of this loud refusal
            raise ValueError(f"malformed pdf xref stream /W {w}: "
                             "field-2 width 0 leaves offsets undefined")
        size = int(info["Size"])
        index = [int(x) for x in info.get("Index", [0, size])]
        if len(index) % 2:
            raise ValueError("malformed pdf xref stream /Index")
        rowlen = sum(w)
        entries: dict[int, object] = {}
        p = 0
        for first, count in zip(index[::2], index[1::2]):
            for i in range(count):
                row = data[p:p + rowlen]
                p += rowlen
                if len(row) < rowlen:
                    raise ValueError("truncated pdf xref stream data")
                fields, q = [], 0
                for width in w:
                    fields.append(
                        int.from_bytes(row[q:q + width], "big")
                        if width else None)
                    q += width
                typ = fields[0] if w[0] else 1    # absent type -> 1
                num = first + i
                if num in entries:
                    continue
                if typ == 0:
                    entries[num] = "free"
                elif typ == 1:
                    entries[num] = ("classic", fields[1])
                elif typ == 2:
                    entries[num] = ("objstm", fields[1], fields[2])
                else:
                    raise ValueError(
                        f"unknown pdf xref stream entry type {typ}")
        return info, entries

    def _raw_stream_after(self, lex: "_PdfLexer", info: dict) -> bytes:
        """Raw stream bytes following an already-parsed stream dict
        (shared by resolve_obj and the xref-stream parser)."""
        if lex.peek_raw(6) != b"stream":
            raise ValueError("pdf: stream dict without stream data")
        lex.p += 6
        if self.d[lex.p:lex.p + 2] == b"\r\n":
            lex.p += 2
        elif self.d[lex.p:lex.p + 1] == b"\n":
            lex.p += 1
        length = self.resolve_obj(info["Length"])
        return self.d[lex.p:lex.p + int(length)]

    # ------------------------ object resolution ---------------------- #

    def resolve_obj(self, ref):
        """Resolve (possibly indirect) to a concrete value.  Reference
        CYCLES (an ObjStm whose xref entry points into itself, a
        stream /Length referencing its own object) are detected via an
        in-progress set and refused with the module's contractual loud
        ValueError — crafted crawl bytes must never drive this into
        RecursionError."""
        if not (isinstance(ref, tuple) and ref and ref[0] == "ref"):
            return ref
        num = ref[1]
        if num in self._cache:
            return self._cache[num]
        resolving = getattr(self, "_resolving", None)
        if resolving is None:
            resolving = self._resolving = set()
        if num in resolving:
            raise ValueError(
                f"malformed pdf: object reference cycle at {num}")
        resolving.add(num)
        try:
            if num in self._in_objstm:
                val = self._resolve_in_objstm(num)
                self._cache[num] = val
                return val
            off = self._offsets.get(num)
            if off is None:
                raise ValueError(f"pdf object {num} not in xref")
            lex = _PdfLexer(self.d, off)
            t1, t2, t3 = (lex.next_token(), lex.next_token(),
                          lex.next_token())
            if not (t1 and t1[0] == "num" and t3 == ("kw", "obj")):
                raise ValueError(f"malformed pdf object header at {off}")
            val = lex.next_object()
            if lex.peek_raw(6) == b"stream":
                raw = self._raw_stream_after(lex, val)
                val = ("stream", val, raw)
            self._cache[num] = val
            return val
        finally:
            resolving.discard(num)

    def _resolve_in_objstm(self, num: int):
        """Object stored inside a /Type /ObjStm container (§7.5.7):
        direct object (no `obj` header, never itself a stream) at
        /First + its header-pair offset."""
        stm_num, idx = self._in_objstm[num]
        if stm_num not in self._objstm_cache:
            container = self.resolve_obj(("ref", stm_num))
            if not (isinstance(container, tuple)
                    and container[0] == "stream"):
                raise ValueError(
                    f"pdf object stream {stm_num} is not a stream")
            info = container[1]
            if _name_of(info.get("Type")) != "ObjStm":
                raise ValueError(
                    f"pdf object {stm_num} is not /Type /ObjStm")
            data = self.stream_data(container)
            n = int(self.resolve_obj(info["N"]))
            first = int(self.resolve_obj(info["First"]))
            hdr = _PdfLexer(data)
            pairs = []
            for _ in range(n):
                a, b = hdr.next_token(), hdr.next_token()
                if not (a and b and a[0] == "num" and b[0] == "num"):
                    raise ValueError(
                        "malformed pdf object stream header")
                pairs.append((a[1], b[1]))
            self._objstm_cache[stm_num] = (data, first, pairs)
        data, first, pairs = self._objstm_cache[stm_num]
        if idx >= len(pairs):
            raise ValueError(
                f"pdf object stream index {idx} out of range")
        onum, ooff = pairs[idx]
        if onum != num:
            raise ValueError("pdf object stream index mismatch: entry "
                             f"{idx} holds object {onum}, xref says {num}")
        return _PdfLexer(data, first + ooff).next_object()

    # --------------------------- stream data ------------------------- #

    def stream_data(self, obj) -> bytes:
        if not (isinstance(obj, tuple) and obj[0] == "stream"):
            raise ValueError("pdf: expected a stream object")
        _, info, raw = obj
        filt = info.get("Filter")
        if filt is None:
            return raw
        filts = [filt] if not isinstance(filt, list) else filt
        parms = info.get("DecodeParms", info.get("DP"))
        parms_list = ([parms] if not isinstance(parms, list) else parms)
        # bounded expansion: crawl bytes are untrusted, and a small
        # crafted Flate/LZW/RLE stream can expand without limit
        # (decompression bomb).  Real text/xref payloads stay well
        # under 64x the FILE size; anything past the cap is refused.
        cap = max(1 << 22, 64 * len(self.d))
        for i, f in enumerate(filts):
            name = _name_of(f)
            if name == "FlateDecode":
                dec = zlib.decompressobj()
                raw = dec.decompress(raw, cap)
                if dec.unconsumed_tail or not dec.eof:
                    raise ValueError(
                        "pdf FlateDecode output exceeds the "
                        f"decompression cap ({cap} bytes) or the "
                        "stream is truncated — refusing a likely bomb")
            elif name == "LZWDecode":
                early = 1
                p0 = parms_list[i] if i < len(parms_list) else None
                if isinstance(p0, tuple) and p0[0] == "ref":
                    p0 = self.resolve_obj(p0)
                if isinstance(p0, dict):
                    early = int(self.resolve_obj(
                        p0.get("EarlyChange", 1)) or 0)
                raw = _lzw_decode(raw, cap, early)
            elif name == "ASCIIHexDecode":
                raw = _asciihex_decode(raw)
                continue                          # no predictor form
            elif name == "ASCII85Decode":
                raw = _ascii85_decode(raw)
                continue
            elif name == "RunLengthDecode":
                raw = _rle_decode(raw)
                if len(raw) > cap:
                    raise ValueError(
                        "pdf RunLengthDecode output exceeds the "
                        f"decompression cap ({cap} bytes)")
                continue
            else:
                raise NotImplementedError(
                    f"pdf filter {name!r} is not supported (Flate/LZW/"
                    "ASCIIHex/ASCII85/RunLength only)")
            # predictors apply to the Flate/LZW branches (§7.4.4.4)
            p = parms_list[i] if i < len(parms_list) else None
            if isinstance(p, tuple) and p[0] == "ref":
                p = self.resolve_obj(p)
            if isinstance(p, dict):
                pred = int(self.resolve_obj(p.get("Predictor", 1)) or 1)
                if pred == 1:
                    continue
                if pred == 2:
                    raise NotImplementedError(
                        "pdf TIFF predictor 2 is not supported")
                if not 10 <= pred <= 15:
                    raise ValueError(f"pdf: unknown predictor {pred}")
                colors = int(self.resolve_obj(p.get("Colors", 1)) or 1)
                bpc = int(self.resolve_obj(
                    p.get("BitsPerComponent", 8)) or 8)
                if colors != 1 or bpc != 8:
                    raise NotImplementedError(
                        "pdf png predictor: only Colors=1 "
                        "BitsPerComponent=8 is supported")
                raw = _png_unpredict(
                    raw, int(self.resolve_obj(p.get("Columns", 1))))
        return raw


def pdf_to_text(data: bytes) -> str:
    """Extract text from a PDF (see the subset contract above): walks
    the page tree in order, decodes each page's content stream(s), and
    emits the arguments of the text-showing operators — ``Td``/``TD``/
    ``T*`` and the ``'``/``\"`` forms start new lines, ``TJ`` array
    elements concatenate (kerning numbers dropped).  Returns pages
    joined by newlines, lines normalized like ``html_to_text``."""
    pdf = _Pdf(data)
    root = pdf.resolve_obj(pdf._trailer["Root"])
    pages: list[dict] = []
    seen: set[int] = set()

    def walk(node_ref):
        if isinstance(node_ref, tuple) and node_ref[0] == "ref":
            if node_ref[1] in seen:      # cyclic page tree: corrupt pdf
                raise ValueError("malformed pdf: page-tree cycle")
            seen.add(node_ref[1])
        node = pdf.resolve_obj(node_ref)
        t = node.get("Type")
        tname = t[1] if isinstance(t, tuple) else t
        if tname == "Pages":
            for kid in pdf.resolve_obj(node["Kids"]):
                walk(kid)
        else:
            pages.append(node)

    walk(root["Pages"])
    lines: list[str] = []
    for page in pages:
        if "Contents" not in page:       # contentless page: spec-legal
            continue
        contents = pdf.resolve_obj(page["Contents"])
        chunks = ([contents] if not isinstance(contents, list)
                  else [pdf.resolve_obj(c) for c in contents])
        data_ = b"".join(pdf.stream_data(c) for c in chunks)
        lines.extend(_content_text_lines(data_))
    return "\n".join(lines)


def _content_text_lines(content: bytes) -> list[str]:
    """Text lines of one content stream: a tiny operand-stack
    interpreter over the text operators (everything else is ignored —
    graphics state has no text)."""
    lex = _PdfLexer(content)
    stack: list = []
    buf: list[bytes] = []
    lines: list[str] = []

    def flush():
        if buf:
            s = b"".join(buf).decode("latin-1")
            s = " ".join(s.split())
            if s:
                lines.append(s)
            buf.clear()

    while True:
        tok = lex.next_token()
        if tok is None:
            break
        kind, v = tok
        if kind == "kw":
            if v == "Tj" and stack and isinstance(stack[-1], bytes):
                buf.append(stack[-1])
            elif v == "TJ" and stack and isinstance(stack[-1], list):
                buf.extend(x for x in stack[-1] if isinstance(x, bytes))
            elif v in ("'", '"'):
                flush()
                se = [x for x in stack if isinstance(x, bytes)]
                if se:
                    buf.append(se[-1])
            elif v in ("Td", "TD", "T*"):
                flush()
            elif v == "ET":
                flush()
            elif v == "ID":
                # inline image (BI ... ID <raw bytes> EI): the bytes
                # are NOT tokens — skip to the EI terminator so binary
                # data can't masquerade as strings/operators
                end = lex.d.find(b"EI", lex.p)
                lex.p = len(lex.d) if end < 0 else end + 2
            stack.clear()
        elif kind in ("<<", ">>"):
            stack.clear()                        # inline dicts: ignore
        elif kind == "[":
            arr = []
            while True:
                t = lex.next_token()
                if t is None or t[0] == "]":
                    break
                if t[0] == "str":
                    arr.append(t[1])
                elif t[0] == "num":
                    arr.append(t[1])
            stack.append(arr)
        elif kind == "str":
            stack.append(v)
        elif kind == "num":
            stack.append(v)
        elif kind == "name":
            stack.append(("name", v))
    flush()
    return lines


def _pdf_escape(line: str) -> bytes:
    out = bytearray()
    for ch in line.encode("latin-1", "replace"):
        if ch in (0x28, 0x29, 0x5C):             # ( ) backslash
            out += b"\\" + bytes([ch])
        elif 32 <= ch <= 126:
            out.append(ch)
        else:
            out += b"\\%03o" % ch
    return bytes(out)


def pdf_write_simple(text: str, *, compress: bool = True) -> bytes:
    """Minimal single-page PDF carrying ``text`` (one ``Tj`` line per
    input line, Helvetica 11pt, optional FlateDecode) — the fixture
    encoder for the round-trip gate, and a writable PDF any desktop
    viewer opens.  ``pdf_to_text(pdf_write_simple(t))`` returns the
    whitespace-normalized lines of ``t``."""
    body = [b"BT /F1 11 Tf 36 756 Td 14 TL"]
    for line in text.split("\n"):
        body.append(b"(" + _pdf_escape(line) + b") Tj T*")
    body.append(b"ET")
    content = b"\n".join(body)
    if compress:
        content = zlib.compress(content, 6)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>"),
        4: (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
        5: (b"<< /Length " + str(len(content)).encode()
            + (b" /Filter /FlateDecode" if compress else b"")
            + b" >>\nstream\n" + content + b"\nendstream"),
    }
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for num in sorted(objs):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
            % (len(objs) + 1, xref_at))
    return bytes(out)


def pdf_write_xref_stream(text: str, *, compress: bool = True) -> bytes:
    """Single-page PDF 1.5 fixture carrying ``text``, written the way
    post-2005 tools write it: Catalog/Pages/Page/Font compressed inside
    a /Type /ObjStm object stream (§7.5.7) and a /Type /XRef
    cross-reference STREAM (§7.5.8) with ``/W [1 4 2]``, a
    two-subsection ``/Index``, FlateDecode and the PNG Up predictor
    (/DecodeParms /Predictor 12 — the wild default).  Text content is
    identical to ``pdf_write_simple``'s, so
    ``pdf_to_text(pdf_write_xref_stream(t)) ==
    pdf_to_text(pdf_write_simple(t))`` — the round-trip gate alternates
    writers to cover both cross-reference forms with one oracle."""
    body = [b"BT /F1 11 Tf 36 756 Td 14 TL"]
    for line in text.split("\n"):
        body.append(b"(" + _pdf_escape(line) + b") Tj T*")
    body.append(b"ET")
    content = b"\n".join(body)
    if compress:
        content = zlib.compress(content, 6)

    # objects 1-4 live inside the object stream (object 6); the two
    # real streams (5: page content, 6: the ObjStm itself, 7: the xref
    # stream) must be top-level — streams may not live in an ObjStm.
    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>"),
        (4, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    payload = bytearray()
    pairs = []
    for num, src in inner:
        pairs.append(b"%d %d" % (num, len(payload)))
        payload += src + b"\n"
    head = b" ".join(pairs) + b"\n"
    first = len(head)
    objstm_plain = bytes(head + payload)
    objstm_data = (zlib.compress(objstm_plain, 6) if compress
                   else objstm_plain)

    flate = b" /Filter /FlateDecode" if compress else b""
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    offsets[5] = len(out)
    out += (b"5 0 obj\n<< /Length %d%s >>\nstream\n"
            % (len(content), flate))
    out += content + b"\nendstream\nendobj\n"
    offsets[6] = len(out)
    out += (b"6 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d%s "
            b">>\nstream\n" % (len(inner), first, len(objstm_data), flate))
    out += objstm_data + b"\nendstream\nendobj\n"
    offsets[7] = len(out)

    def row(t: int, f2: int, f3: int) -> bytes:
        return bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")

    rows = [row(0, 0, 0xFFFF)]                        # object 0: free
    rows += [row(2, 6, i) for i in range(len(inner))]  # 1-4: in ObjStm 6
    rows += [row(1, offsets[5], 0), row(1, offsets[6], 0),
             row(1, offsets[7], 0)]                   # 5-7: top-level
    raw = b"".join(rows)
    if compress:
        cols = 7                                      # sum of /W
        enc = bytearray()
        prev = bytes(cols)
        for i in range(0, len(raw), cols):
            r = raw[i:i + cols]
            enc.append(2)                             # PNG Up filter
            enc += bytes((r[j] - prev[j]) & 0xFF for j in range(cols))
            prev = r
        xref_data = zlib.compress(bytes(enc), 6)
        xfilt = (b" /Filter /FlateDecode /DecodeParms "
                 b"<< /Predictor 12 /Columns 7 >>")
    else:
        xref_data = raw
        xfilt = b""
    out += (b"7 0 obj\n<< /Type /XRef /Size 8 /W [1 4 2] "
            b"/Index [0 5 5 3] /Root 1 0 R /Length %d%s >>\nstream\n"
            % (len(xref_data), xfilt))
    out += xref_data + b"\nendstream\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF" % offsets[7]
    return bytes(out)


def extract_pdf(df: DataFrame, pdf_col: str = "pdf",
                out_col: str = "text") -> DataFrame:
    """``pdf_to_text`` over a binary DataFrame column (Arrow-batched
    pandas UDF; NULL blobs stay NULL).  Rows independent — no shuffle,
    no state; the multimodal-decode UDF slot."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _extract(s):
        return s.map(lambda b: None if b is None
                     else pdf_to_text(bytes(b)))

    _extract.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = pandas_udf(_extract, "string")
    return df.withColumn(out_col, udf(F.col(pdf_col)))
