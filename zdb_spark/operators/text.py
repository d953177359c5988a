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

__all__ = ["tokenize", "token_counts", "language_id", "quality_features",
           "fingerprint", "LANG_MARKERS", "EN_STOPWORDS"]

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
        punct_ratio = n_punct.cast("double") / n_chars
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
