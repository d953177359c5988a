"""Text-analysis operators for large-scale training-data pipelines.

These are additive on the engine surface (BASELINE.json north star): the
reference delegates all text work to its embedded scripting language; a
100 TB data pipeline needs them as first-class, JVM-side operators.

Everything here is built from ``pyspark.sql.functions`` only — no Python
UDFs — so the whole pack stays inside whole-stage codegen and scales
linearly with executors.  Each operator has an exactly-equivalent DuckDB
SQL form (used by the driver's oracle check); keep the two in sync.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.scalar import round0

__all__ = ["tokenize", "token_counts", "language_id", "quality_features",
           "fingerprint", "repetition_features", "redact_pii",
           "quality_score_linear", "bigram_logprob", "char_entropy",
           "normalize_url", "extract_domain",
           "strip_repeated_lines", "strip_boilerplate_lines",
           "strip_lines_against", "build_boilerplate_store",
           "c4_line_clean", "gopher_quality_flags",
           "append_boilerplate_store", "chrome_lines",
           "LANG_MARKERS", "EN_STOPWORDS", "PII_PATTERNS"]

# Marker stopwords per language for the n-gram/marker-word language-ID
# heuristic.  Chosen from the top closed-class words of each language;
# the heuristic is deterministic and mirrored in the DuckDB oracle.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "you", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se", "del", "las"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "des", "un", "une", "est", "dans", "que"],
}

EN_STOPWORDS = LANG_MARKERS["en"]

# BPE-ish token pattern: runs of alphanumerics OR single non-space symbol.
# ASCII classes only — identical semantics in Spark (Java regex) and
# DuckDB (RE2).
TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def tokenize(text: Column | str) -> Column:
    """Whitespace tokens of lowercased text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(F.lower(c)), r"\s+")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per row."""
    toks = tokenize(text_col)
    return df.withColumns({
        "n_ws_tokens": F.size(toks),
        "n_bpe_tokens": F.size(F.regexp_extract_all(
            F.col(text_col), F.lit(TOKEN_PATTERN), F.lit(0))),
    })


def _marker_hits(toks: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def language_id(df: DataFrame, text_col: str = "text",
                out_col: str = "lang_pred") -> DataFrame:
    """Marker-word language ID over {en,es,de,fr} + CJK detection for zh.

    Deterministic tie-break: strict argmax in fixed order en>es>de>fr;
    all-zero → 'und'.  CJK codepoints short-circuit to 'zh'.
    """
    from .dedup import let

    def pick(toks: Column) -> Column:
        scores = {lang: _marker_hits(toks, m)
                  for lang, m in LANG_MARKERS.items()}
        return let(
            F.struct(*[scores[lang].alias(lang) for lang in LANG_MARKERS]),
            lambda s: _argmax_lang(s))

    def _argmax_lang(s: Column) -> Column:
        best = F.greatest(*[s[lang] for lang in LANG_MARKERS])
        pred = (F.when(F.col(text_col).rlike(r"[一-鿿]"), F.lit("zh"))
                .when(best == 0, F.lit("und")))
        for lang in LANG_MARKERS:  # fixed order = deterministic tie-break
            pred = pred.when(s[lang] == best, F.lit(lang))
        return pred

    return df.withColumn(out_col, let(tokenize(text_col), pick))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword quality features + composite score.

    score = 0.4·min(n_words/100, 1) + 0.3·(1 − punct_ratio)
          + 0.3·min(stopword_ratio·5, 1)   — bounded to [0, 1].

    The token array is let-bound into one struct so the split/regex runs
    once per row, not once per derived feature.
    """
    from .dedup import let

    def feats(toks: Column) -> Column:
        n_chars = F.length(text_col)
        n_words = F.size(toks)
        sum_word_len = F.aggregate(
            F.transform(toks, lambda t: F.length(t)),
            F.lit(0), lambda acc, x: acc + x)
        n_punct = n_chars - F.length(
            F.regexp_replace(F.col(text_col), r"[.,!?;:]", ""))
        n_stop = _marker_hits(toks, EN_STOPWORDS)
        # greatest(n_chars, 1): an empty document must score 0 punct,
        # not NULL (Spark non-ANSI 0/0) — same guard logreg_features uses
        punct_ratio = n_punct.cast("double") / F.greatest(
            n_chars, F.lit(1))
        stop_ratio = n_stop.cast("double") / n_words
        score = (F.lit(0.4) * F.least(n_words.cast("double") / 100, F.lit(1.0))
                 + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
                 + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0)))
        return F.struct(
            n_chars.alias("n_chars_c"),
            n_words.alias("n_words"),
            F.round(sum_word_len.cast("double") / n_words, 4)
             .alias("avg_word_len"),
            F.round(punct_ratio, 6).alias("punct_ratio"),
            F.round(stop_ratio, 6).alias("stopword_ratio"),
            F.round(score, 6).alias("quality_score"))

    out = let(tokenize(text_col), feats)
    df = df.withColumn("_qf", out)
    for f in ("n_chars_c", "n_words", "avg_word_len", "punct_ratio",
              "stopword_ratio", "quality_score"):
        df = df.withColumn(f, F.col(f"_qf.{f}"))
    return df.drop("_qf")


def _max_run(sorted_arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements in a SORTED
    array == the count of the most frequent element.  One O(n) fold over
    the array (after the O(n log n) sort) — per-row, JVM-side, zero
    shuffle, vs. the explode + groupBy(doc, gram) alternative whose
    shuffle is keyed on every gram occurrence in the corpus.  At 100 TB
    the per-row form wins outright: documents are bounded (MBs), so the
    row-local n log n is trivial next to a corpus-wide shuffle."""
    return F.aggregate(
        sorted_arr,
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
             .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)))
             .alias("best")),
        lambda acc: acc["best"])


def _ngram_col(toks: Column, n: int) -> Column:
    """Word n-grams of a token array as space-joined strings (empty array
    when the doc has fewer than n tokens)."""
    if n == 1:
        return toks
    grams = F.transform(
        toks,
        lambda x, i: F.concat_ws(
            " ", x,
            # try_: the last n-1 positions run past the end (NULL); those
            # truncated grams are sliced off below
            *[F.try_element_at(toks, i + j + 1) for j in range(1, n)]))
    # the last n-1 entries are truncated grams — slice them off
    return F.slice(grams, F.lit(1),
                   F.greatest(F.size(toks) - (n - 1), F.lit(0)))


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition-based quality signals (the Gopher-rules family): heavy
    within-document repetition is the strongest cheap predictor of
    boilerplate / spam / generation loops in web-scale corpora.

    Adds per row:
      dup_line_frac    — 1 − distinct(lines)/lines, lines split on \n
      dup_para_frac    — same over paragraphs (split on blank line)
      top_bigram_frac  — share of all word-bigram occurrences taken by
                         the single most frequent bigram
      top_trigram_frac — same for trigrams

    All four are row-local ``pyspark.sql.functions`` expressions (no
    Python, no shuffle): the mode count is a fold over the SORTED gram
    array (see ``_max_run``), so cost is O(len log len) per document and
    the operator scales embarrassingly with executors.  Fractions are 0.0
    for degenerate docs (no lines / fewer than n tokens).  Mirrored
    bit-for-bit by a DuckDB oracle (gate entry ``text_repetition``).
    """
    from .dedup import let

    def line_frac(parts: Column) -> Column:
        n = F.size(parts)
        return F.when(n <= 0, F.lit(0.0)).otherwise(
            F.lit(1.0) - F.size(F.array_distinct(parts)).cast("double") / n)

    def gram_frac(toks: Column, n: int) -> Column:
        return let(
            _ngram_col(toks, n),
            lambda grams: F.when(F.size(grams) <= 0, F.lit(0.0)).otherwise(
                _max_run(F.array_sort(grams)).cast("double")
                / F.size(grams)))

    toks = tokenize(text_col)
    return df.withColumns({
        "dup_line_frac": F.round(
            line_frac(F.split(F.col(text_col), r"\n")), 6),
        "dup_para_frac": F.round(
            line_frac(F.split(F.col(text_col), r"\n\n")), 6),
        "top_bigram_frac": F.round(let(toks, lambda t: gram_frac(t, 2)), 6),
        "top_trigram_frac": F.round(let(toks, lambda t: gram_frac(t, 3)), 6),
    })


# PII patterns: ASCII-only, no lookaround, no backrefs — the subset where
# Java regex (Spark) and RE2 (DuckDB) agree byte-for-byte, so the oracle
# reproduces redaction exactly.  Order matters: SSN before phone (a
# US SSN also matches loose phone shapes).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def char_entropy(df: DataFrame, text_col: str = "text",
                 out_col: str = "char_entropy",
                 round_dp: int = 6) -> DataFrame:
    """Character-level Shannon entropy per document — the classic
    gibberish / boilerplate / base64-blob quality signal (low entropy =
    repeated filler, high entropy = random noise; prose sits ~3.5-4.5
    bits/char).

    Row-local and shuffle-free: H = log2(n) - Σ cnt·log2(cnt) / n over
    the per-character counts, computed entirely with higher-order
    Catalyst expressions (split → array_distinct → one count per
    DISTINCT char via ``filter``).  Cost is O(distinct_chars × length)
    per row — distinct chars is alphabet-bounded (≤ ~100 for text), so
    the scan stays linear in corpus size with zero Python and zero
    shuffle.  The Σ-over-distinct form (instead of Σ p·log2 p over
    positions) makes the fold order-insensitive up to FP noise, which
    the final rounding kills — the DuckDB oracle mirrors the same
    formula even though its ``list_distinct`` orders differently.
    """
    from .dedup import let

    # Java's split("", -1) keeps a trailing "" element that DuckDB's
    # string_split does not produce — strip it so n and the distinct
    # set agree across engines (real chars are never empty strings).
    expr = let(
        F.array_remove(F.split(F.col(text_col), ""), ""),
        lambda chars: let(
            F.size(chars).cast("double"),
            lambda n: F.when(n <= 0, F.lit(0.0)).otherwise(F.round(
                F.log2(n)
                - F.aggregate(
                    F.transform(
                        F.array_distinct(chars),
                        lambda ch: let(
                            F.size(F.filter(chars, lambda x: x == ch))
                            .cast("double"),
                            lambda cnt: cnt * F.log2(cnt))),
                    F.lit(0.0), lambda acc, x: acc + x) / n,
                round_dp))))
    return df.withColumn(out_col, expr)


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Mask emails / SSNs / phone numbers / IPv4s and count each kind.

    Chained ``regexp_replace`` — one codegen'd projection, no UDF.  The
    counts are taken BEFORE any replacement (on the original text) so
    ``n_email``..``n_ipv4`` report true occurrences even when patterns
    overlap; the redaction chain itself applies in ``PII_PATTERNS`` order
    so overlapping matches resolve deterministically (SSN wins over
    phone).  A curation pipeline filters on the counts and ships
    ``redacted``.
    """
    out = F.col(text_col)
    counts = {}
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        out = F.regexp_replace(out, pat, repl)
    return df.withColumns({**counts, out_col: out})


def bigram_logprob(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", k: float = 0.1,
                   out_col: str = "avg_logprob") -> DataFrame:
    """Corpus-trained bigram language model score per document — the
    perplexity-filtering shape (KenLM-style): documents whose word
    transitions are improbable under the corpus's own statistics are
    boilerplate/garble candidates.

    Model: add-k smoothed bigram LM trained on the SAME corpus;
    ``logp(w2|w1) = ln((c(w1 w2) + k) / (c(w1·) + k·V))`` with ``c(w1·)``
    the bigram-prefix count and ``V`` the distinct-unigram vocabulary.
    Output: (id, n_bigrams, avg_logprob) — mean transition log-prob.

    Shape at scale: train = two partially-aggregated groupBys over the
    exploded bigram stream (map-side combine shrinks both); score = the
    same stream joined back to the count tables on their natural keys —
    sort-merge joins AQE handles, no broadcast assumption (the count
    table of a 100 TB corpus is itself large).  V is one scalar agg.
    Docs with fewer than 2 tokens get NULL (no transitions to score).
    """
    from .dedup import let

    # let-bind the token array: _ngram_col's lambda references its toks
    # argument n-1 times per element, and Catalyst has no CSE inside HOF
    # lambda bodies — an unbound tokenize() subtree would re-run the
    # split regex O(n) times per row (the hazard dedup.let documents)
    toks = tokenize(text_col)
    grams = let(toks, lambda t: _ngram_col(t, 2))
    ex = (df.select(F.col(id_col), F.explode(grams).alias("bg"))
          .withColumn("w1", F.split("bg", " ").getItem(0)))
    bg_counts = ex.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    w1_counts = ex.groupBy("w1").agg(F.count(F.lit(1)).alias("c_w1"))
    vocab = (df.select(F.explode(toks).alias("t")).distinct().count())
    logp = F.log((F.col("c_bg") + F.lit(k))
                 / (F.col("c_w1") + F.lit(k * vocab)))
    scored = (ex.join(bg_counts, "bg").join(w1_counts, "w1")
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_bigrams"),
                   round0(F.avg(logp), 6).alias(out_col)))
    return df.select(id_col).join(scored, id_col, "left")


def quality_score_linear(df: DataFrame, weights: list[float],
                         bias: float = 0.0, text_col: str = "text",
                         out_col: str = "model_score") -> DataFrame:
    """Model-based quality scoring: a linear classifier over
    hashing-trick token features (the fastText-style quality-filter
    shape used to grade web corpora).

    ``weights`` is the trained weight vector (dimension = feature-space
    size); each token maps to ``md5(token)[:8] % len(weights)`` and the
    document score is ``bias + mean(weights[feature(token)])``.  The
    weight vector inlines into the plan as an array literal
    (broadcast-by-value; fastText-scale quality models are a few
    hundred KB) and scoring is one codegen'd fold per row — no shuffle,
    no Python, linear in corpus tokens.  The md5-based feature hash is
    engine-portable, so the DuckDB gate oracle reproduces scores
    bit-for-bit; rounded to 6 decimals.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    from .dedup import let

    n = len(weights)
    # one py4j call (ArrayType(double) literal), not one per weight —
    # same doubles, same values (similarity._vec_lit rationale)
    from .similarity import _vec_lit
    warr = _vec_lit([float(w) for w in weights])

    def idx(tok: Column) -> Column:
        h = F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
        return (h % n + 1).cast("int")  # 1-based for element_at

    score = let(
        tokenize(text_col),
        lambda toks: F.lit(bias)
        + F.aggregate(F.transform(toks, lambda t: F.element_at(warr, idx(t))),
                      F.lit(0.0), lambda acc, x: acc + x)
        / F.greatest(F.size(toks), F.lit(1)))
    return df.withColumn(out_col, F.round(score, 6))


def fingerprint(df: DataFrame, text_col: str = "text", k: int = 8) -> DataFrame:
    """Document fingerprint: the minimum md5 over all k-char shingles of
    the normalized text (a deterministic 1-permutation MinHash), plus the
    distinct-shingle count.  Rolling-hash flavored but built on md5 so the
    DuckDB oracle can reproduce it bit-for-bit.
    """
    from .dedup import let, shingle_col

    out = let(
        shingle_col(text_col, k),
        lambda sh: F.struct(
            F.array_min(F.transform(
                sh, lambda s: F.md5(s.cast("binary")))).alias("fp"),
            F.size(sh).alias("n")))
    return (df.withColumn("_fp", out)
              .withColumns({"fp_min_hash": F.col("_fp.fp"),
                            "n_shingles": F.col("_fp.n")})
              .drop("_fp"))


# --------------------------------------------------------------------- #
# URL canonicalization (web-corpus curation)                             #
# --------------------------------------------------------------------- #
# Tracking parameters stripped by normalize_url.  The leading [?&]
# capture anchors the match at a real parameter boundary (a bare
# "ref=..." pattern would also fire inside "...href=...").  ASCII-only,
# no lookaround — identical semantics in Spark (Java regex) and DuckDB
# (RE2); keep the SQL oracle in sync when editing.
TRACKING_PARAM_PATTERN = r"([?&])(utm_[a-z0-9]+|fbclid|gclid|ref)=[^&#]*"


def normalize_url(url: Column | str) -> Column:
    """Canonicalize a URL for dedup/grouping: lowercase scheme+host,
    strip ``www.``, strip default ports (:80/:443), drop the fragment,
    drop tracking parameters (utm_*, fbclid, gclid, ref), and tidy the
    leftover ``?``/``&`` punctuation.  Two URLs that differ only in
    these never-semantic ways normalize identically — the key for
    URL-level exact dedup and per-domain grouping of a web corpus.

    Pure regexp_replace chain (codegen'd, no Python); NOT a full RFC
    3986 resolver — paths and non-tracking query params pass through
    byte-exact, on purpose (aggressive rewrites merge genuinely
    different pages).  Every pattern avoids lookaround so the DuckDB
    (RE2) oracle runs the literally-same regexes.
    """
    c = F.col(url) if isinstance(url, str) else url
    # lowercase ONLY scheme://host[:port] — path/query stay case-exact
    c = F.concat(
        F.lower(F.regexp_extract(c, r"^([a-zA-Z]+://[^/]*)", 1)),
        F.regexp_replace(c, r"^[a-zA-Z]+://[^/]*", ""))
    c = F.regexp_replace(c, r"^([a-z]+://)www\.", r"$1")
    # DEFAULT-port stripping is scheme-conditional: http://host:443 is a
    # real non-default origin and must NOT merge with https://host (nor
    # https://host:80 with http://host)
    c = F.regexp_replace(c, r"^(http://[^/:]*):80([/?#]|$)", r"$1$2")
    c = F.regexp_replace(c, r"^(https://[^/:]*):443([/?#]|$)", r"$1$2")
    c = F.regexp_replace(c, r"#.*$", "")
    c = F.regexp_replace(c, TRACKING_PARAM_PATTERN, r"$1")
    c = F.regexp_replace(c, r"\?&+", "?")      # ?&id=1  -> ?id=1
    c = F.regexp_replace(c, r"&&+", "&")       # a=1&&b -> a=1&b
    c = F.regexp_replace(c, r"[?&]+$", "")     # trailing separators
    return c


def extract_domain(url: Column | str) -> Column:
    """Registrable host of a URL, lowercased, ``www.``/port stripped —
    the grouping key for per-domain caps and domain-level stats.  (No
    public-suffix-list logic: that is a lookup table a deployment
    broadcasts and joins; this returns the full host.)"""
    c = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(c, r"^[a-zA-Z]+://([^/:?#]*)", 1))
    return F.regexp_replace(host, r"^www\.", "")


def logreg_features(df: DataFrame, text_col: str = "text",
                    label_expr: Column | None = None) -> DataFrame:
    """Surface-feature vector for the trainable quality classifier:
    (x0 bias=1, x1 length score, x2 punctuation ratio, x3 English
    stopword share) + a 0/1 ``y`` label — every feature the EXACT same
    expression family the corpus_report gate already oracle-mirrors, so
    training is cross-engine reproducible.  Row-local, zero shuffle."""
    txt = F.col(text_col)
    # the module's ONE tokenization + marker-hit helpers — inline copies
    # could drift from the oracle-mirrored expression family
    toks = tokenize(txt)
    n_words = F.size(toks)
    n_chars = F.length(txt)
    n_punct = n_chars - F.length(F.regexp_replace(txt, "[.,!?;:]", ""))
    s_en = _marker_hits(toks, EN_STOPWORDS)
    out = df.select(
        F.lit(1.0).alias("x0"),
        F.least(n_words / F.lit(100.0), F.lit(1.0)).alias("x1"),
        (n_punct / F.greatest(n_chars, F.lit(1))).alias("x2"),
        F.least(s_en / F.greatest(n_words, F.lit(1)) * 5.0,
                F.lit(1.0)).alias("x3"),
        (label_expr.cast("int").cast("double") if label_expr is not None
         else F.lit(0.0)).alias("y"))
    return out


def train_quality_logreg(df: DataFrame, text_col: str = "text", *,
                         label_expr: Column, n_iters: int = 3,
                         lr: float = 1.0) -> list[float]:
    """Train a logistic-regression quality/label classifier by full-batch
    gradient ascent: each iteration is ONE distributed aggregation pass
    (map-side combined; the only driver state is the 4-float weight
    vector), so cost is n_iters linear scans — the textbook distributed
    GD shape that holds at 100 TB.

    Cross-engine determinism: each iteration's per-feature gradient
    ``avg(x_j * (y - sigmoid(w.x)))`` is rounded to 6 decimals before
    updating ``w`` (and lr defaults to 1.0, an exact multiplier), so the
    weight sequence is a sum of exact decimals — an independent engine
    (the DuckDB gate oracle) replaying the same iterations lands on
    bit-identical weights.  Returns [w0, w1, w2, w3].
    """
    feats = logreg_features(df, text_col, label_expr).cache()
    try:
        w = [0.0, 0.0, 0.0, 0.0]
        xs = [F.col(f"x{j}") for j in range(4)]
        for _ in range(n_iters):
            margin = sum((F.lit(w[j]) * xs[j] for j in range(4)),
                         start=F.lit(0.0))
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
            row = feats.agg(*[
                F.round(F.avg(xs[j] * (F.col("y") - p)), 6)
                 .alias(f"g{j}") for j in range(4)]).collect()[0]
            w = [w[j] + lr * row[f"g{j}"] for j in range(4)]
        return w
    finally:
        feats.unpersist()


def _check_sep(sep: str) -> None:
    """The line operators split on ``sep`` as a Java regex but re-join
    with it as a LITERAL — safe only when the two readings coincide.
    Refuse regex metacharacters loudly instead of silently shredding
    text (``sep="."`` would split between every character and 'rejoin'
    with literal dots).  Note ``re.escape`` is the wrong test here — it
    also escapes plain whitespace like ``\\n``, which is NOT a
    metacharacter and is the default separator."""
    _META = set("\\^$.|?*+()[]{}")
    if any(ch in _META for ch in sep):
        raise ValueError(
            f"sep {sep!r} contains regex metacharacters: it would split "
            f"as a regex but re-join as a literal; use a plain separator")


def strip_repeated_lines(df: DataFrame, text_col: str = "text",
                         sep: str = "\n",
                         out_col: str = "clean_text") -> DataFrame:
    """IN-document line dedup: keep only the FIRST occurrence of each
    line within a document, preserving order — the cheap half of
    boilerplate removal (nav menus / footers repeated inside one page;
    the RefinedWeb-class line filters start here).  Public recipe:
    Penedo et al. 2023 (RefinedWeb), line-wise filtering stage.

    Entirely row-local: one ``split`` + an index-aware ``filter`` whose
    keep rule is ``array_position(lines, x) == i + 1`` (first index wins)
    + ``array_join``.  Zero shuffle, zero Python, whole-stage codegen —
    at 100 TB this is a pure projection on the corpus scan.  NULL text
    stays NULL.  Returns the frame + (n_lines, n_kept, out_col).
    """
    from .dedup import let

    _check_sep(sep)
    lines = F.split(F.col(text_col), sep)
    kept = let(lines, lambda ls: F.filter(
        ls, lambda x, i: F.array_position(ls, x) == i + F.lit(1)))
    return (df.withColumn("n_lines", F.size(lines))
              .withColumn("_zdb_kept", kept)
              .withColumn("n_kept", F.size("_zdb_kept"))
              .withColumn(out_col, F.array_join("_zdb_kept", sep))
              .drop("_zdb_kept"))


def strip_boilerplate_lines(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            group_col: str = "source",
                            min_docs: int = 3, sep: str = "\n",
                            out_col: str = "clean_text",
                            cache_lines: bool = False) -> DataFrame:
    """CROSS-document boilerplate removal: a line occurring in at least
    ``min_docs`` DISTINCT documents of the same ``group_col`` (site /
    domain / source) is template chrome, and EVERY occurrence is
    stripped from every document of that group — the CCNet-class
    dedup-by-frequency step (Wenzek et al. 2020, public), distinct from
    ``dedup_paragraphs`` which keeps first occurrences.

    Plan shape (100 TB): explode to (group, line) — row-local — then
    ONE partially-aggregated count (``countDistinct`` per (group,
    line hash); map-side combine collapses each task's repeats), a
    LEFT ANTI sort-merge join back on the same natural keys (the
    boilerplate table of a 100 TB corpus is itself large — no broadcast
    assumption), and ONE doc-keyed rebuild aggregation.  A mega-group's
    chrome line concentrates on a reducer only for the cheap count; the
    rebuild shuffle is keyed by doc and therefore even.

    Returns (id, group, n_lines, n_kept, out_col) — docs whose every
    line was chrome rebuild to the empty string.

    ``cache_lines=True`` persists the exploded (id, grp, line, hash)
    stream so the chrome COUNT pass and the strip join read ONE
    materialization instead of exploding + md5-hashing every line
    twice — right when the upstream is worth not re-running or the
    operator sits inside a larger persisted pipeline (curation_v3);
    leave False when two row-local passes beat materializing the
    exploded stream (the usual 100 TB call — same trade as
    ``importance_weights(cache_features=)``).  The persisted frame
    rides on the result as ``_zdb_cache_handles``.
    """
    ex = _line_explode(df, text_col, id_col, group_col, sep)
    if cache_lines:
        ex = ex.persist()
    boiler = (ex.groupBy("grp", "_h")
                .agg(F.countDistinct("id").alias("_nd"))
                .where(F.col("_nd") >= min_docs)
                .select("grp", "_h"))
    out = strip_lines_against(df, boiler, text_col, id_col, group_col,
                              sep, out_col,
                              lines=ex if cache_lines else None)
    if cache_lines:
        out._zdb_cache_handles = [ex]
    return out


def _line_explode(df: DataFrame, text_col: str, id_col: str,
                  group_col: str, sep: str) -> DataFrame:
    """(id, grp, ln_pos, line, _h=md5(line)) — shared by the batch
    strip, the persisted-store builders, and the cleaning join."""
    _check_sep(sep)
    return (df.select(F.col(id_col).alias("id"),
                      F.col(group_col).alias("grp"),
                      F.posexplode(F.split(F.col(text_col), sep))
                       .alias("ln_pos", "line"))
              .withColumn("_h", F.md5(F.col("line"))))


def strip_lines_against(df: DataFrame, chrome: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        group_col: str = "source", sep: str = "\n",
                        out_col: str = "clean_text",
                        lines: DataFrame | None = None) -> DataFrame:
    """Strip every occurrence of the given chrome lines — ``chrome`` is
    a (grp, _h) frame from ``strip_boilerplate_lines``'s counting stage
    or from a persisted store (``chrome_lines``) — and rebuild each
    document in order.  LEFT ANTI sort-merge join on natural keys (no
    broadcast assumption) + one doc-keyed rebuild aggregation.

    NULL text yields no exploded rows, which is indistinguishable from
    an all-chrome document in the rebuild — so the base frame carries
    an explicit null flag and NULL text comes back all-NULL
    (n_lines NULL, n_kept NULL, text NULL) — exactly what
    ``strip_repeated_lines`` yields for NULL text, where every derived
    column is itself an expression over the NULL split; only genuinely
    all-chrome documents coerce to the empty string.

    ``lines``: a precomputed ``_line_explode(df, ...)`` frame (e.g. the
    one the chrome count already materialized under
    ``cache_lines=True``) — must be the SAME df/columns/sep explode."""
    ex = lines if lines is not None \
        else _line_explode(df, text_col, id_col, group_col, sep)
    kept = ex.join(chrome, ["grp", "_h"], "left_anti")
    rebuilt = (kept.groupBy("id")
               .agg(F.count(F.lit(1)).alias("n_kept"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("ln_pos", "line"))),
                            lambda s: s["line"]), sep).alias(out_col)))
    base = df.select(F.col(id_col).alias("id"),
                     F.col(group_col).alias("grp"),
                     F.size(F.split(F.col(text_col), sep))
                      .alias("n_lines"),
                     F.col(text_col).isNull().alias("_null_txt"))
    return (base.join(rebuilt, "id", "left")
            .select("id", "grp", "n_lines",
                    F.when(F.col("_null_txt"),
                           F.lit(None).cast("long"))
                     .otherwise(F.coalesce("n_kept", F.lit(0)))
                     .cast("long").alias("n_kept"),
                    F.when(F.col("_null_txt"),
                           F.lit(None).cast("string"))
                     .otherwise(F.coalesce(out_col, F.lit("")))
                     .alias(out_col)))


def build_boilerplate_store(df: DataFrame, path: str,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            group_col: str = "source",
                            sep: str = "\n") -> None:
    """Persist per-(group, line) DISTINCT-document counts as parquet —
    the incremental state continuous chrome-stripping needs.  Rows are
    PARTIAL counts (this frame's contribution); ``append`` adds a new
    batch's partials and ``chrome_lines`` merges by sum at read — the
    rollup_sink partial-merge pattern.  Exactness contract: batches
    must be id-disjoint (the ordered-ingest contract), so per-batch
    distinct-doc counts sum to the global distinct count.

    Layout: one ``batch=<id>/`` subdirectory per contribution, written
    with OVERWRITE — so a foreachBatch replay (at-least-once delivery)
    rewrites its own subdirectory instead of double-counting into a
    shared file set.  Idempotence comes from the layout, not from the
    caller getting crash timing right."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    append_boilerplate_store(df, path, "seed", text_col, id_col,
                             group_col, sep)


def append_boilerplate_store(df: DataFrame, path: str, batch_id,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             group_col: str = "source",
                             sep: str = "\n") -> None:
    """Write one id-disjoint batch's partial counts into the store as
    ``batch=<batch_id>/`` with OVERWRITE — replaying the same batch id
    (foreachBatch at-least-once) is a no-op rewrite, never a
    double-count.  Cost ∝ batch (one explode + one partial-aggregated
    count)."""
    import os as _os

    _boilerplate_partials(df, text_col, id_col, group_col, sep) \
        .write.mode("overwrite") \
        .parquet(_os.path.join(path, f"batch={batch_id}"))


def _boilerplate_partials(df: DataFrame, text_col: str, id_col: str,
                          group_col: str, sep: str) -> DataFrame:
    return (_line_explode(df, text_col, id_col, group_col, sep)
            .groupBy("grp", "_h")
            .agg(F.countDistinct("id").alias("nd")))


def chrome_lines(spark, path: str, min_docs: int = 3) -> DataFrame:
    """The current chrome set from a persisted store: merge partial
    counts by sum across the ``batch=*`` contributions and threshold —
    (grp, _h) rows for ``strip_lines_against``."""
    return (spark.read.parquet(path)
            .groupBy("grp", "_h")
            .agg(F.sum("nd").alias("nd"))
            .where(F.col("nd") >= min_docs)
            .select("grp", "_h"))


def c4_line_clean(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", min_words: int = 5,
                  out_col: str = "clean_text") -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020, the public C4
    construction rules, line stage): keep only lines that end in a
    terminal punctuation mark (. ! ? ") AND have at least ``min_words``
    whitespace words AND do not mention javascript / cookie / lorem
    ipsum boilerplate (case-insensitive), then rebuild the document.

    Entirely row-local higher-order expressions — at 100 TB this is a
    pure projection on the corpus scan, the same shape as
    strip_repeated_lines.  Returns (id, n_lines, n_kept, clean_text,
    c4_doc_ok) where ``c4_doc_ok`` applies the C4 document gates on the
    CLEANED text: >= 3 surviving lines and no curly brace (the code
    marker; the n-gram dedup stage is dedup_spans' job, not this one).
    NULL text stays NULL with c4_doc_ok false.
    """
    from .dedup import let

    lines = F.split(F.col(text_col), "\n")
    bad = r"(?i)(javascript|lorem ipsum|cookies)"

    def keep(ls: Column) -> Column:
        return F.filter(ls, lambda x: (
            x.rlike(r'[.!?"]\s*$')
            & (F.size(F.split(F.trim(x), r"\s+")) >= min_words)
            & ~x.rlike(bad)))

    kept = let(lines, keep)
    return (df.select(F.col(id_col).alias("id"),
                      F.size(lines).alias("n_lines"),
                      F.size(kept).alias("n_kept"),
                      F.array_join(kept, "\n").alias(out_col))
              .withColumn("c4_doc_ok",
                          F.coalesce((F.col("n_kept") >= 3)
                                     & ~F.col(out_col).contains("{"),
                                     F.lit(False))))


def gopher_quality_flags(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Gopher/MassiveText document-quality rules (Rae et al. 2021,
    table A1 — the public heuristic set), each as its own boolean so a
    pipeline can tune which to enforce, plus the conjunction:

    - ``ok_word_count``: 50 <= words <= 100,000
    - ``ok_mean_word_len``: mean word length in [3, 10]
    - ``ok_hash_ellipsis``: #-symbol ratio <= 0.1 and ellipsis-line
      ratio <= 0.3 of lines
    - ``ok_bullets``: <= 90% of lines start with a bullet (- or *)
    - ``ok_stopwords``: >= 2 distinct English stop words present
      (the "real prose" signal)
    - ``gopher_ok``: all of the above

    One ``tokenize`` pass shared across every rule via a let-bound
    struct; zero shuffle, zero Python.  NULL text fails every flag.
    """
    from .dedup import let

    def flags(toks: Column) -> Column:
        n_words = F.size(toks)
        mean_wl = (F.aggregate(F.transform(toks, F.length),
                               F.lit(0), lambda a, x: a + x)
                   .cast("double") / n_words)
        n_chars = F.length(text_col)
        n_hash = n_chars - F.length(F.regexp_replace(
            F.col(text_col), "#", ""))
        lines = F.split(F.col(text_col), "\n")
        n_lines = F.size(lines)
        n_ellipsis = F.size(F.filter(
            lines, lambda x: x.rlike(r"(\.\.\.|…)\s*$")))
        n_bullet = F.size(F.filter(
            lines, lambda x: F.trim(x).rlike(r"^[-*]")))
        n_stop = F.size(F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in EN_STOPWORDS])))
        return F.struct(
            ((n_words >= 50) & (n_words <= 100_000))
            .alias("ok_word_count"),
            ((mean_wl >= 3.0) & (mean_wl <= 10.0))
            .alias("ok_mean_word_len"),
            ((n_hash.cast("double") / F.greatest(n_chars, F.lit(1))
              <= 0.1)
             & (n_ellipsis.cast("double") / n_lines <= 0.3))
            .alias("ok_hash_ellipsis"),
            (n_bullet.cast("double") / n_lines <= 0.9)
            .alias("ok_bullets"),
            (n_stop >= 2).alias("ok_stopwords"))

    out = df.withColumn("_gq", let(tokenize(text_col), flags))
    names = ["ok_word_count", "ok_mean_word_len", "ok_hash_ellipsis",
             "ok_bullets", "ok_stopwords"]
    for n in names:
        out = out.withColumn(n, F.coalesce(F.col(f"_gq.{n}"),
                                           F.lit(False)))
    cond = F.col(names[0])
    for n in names[1:]:
        cond = cond & F.col(n)
    return out.drop("_gq").withColumn("gopher_ok", cond)
