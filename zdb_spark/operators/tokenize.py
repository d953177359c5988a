"""Byte-pair-encoding tokenization: distributed train + JVM-side apply.

The reference's text surface stops at symbol dictionaries
(src/table/read.rs:71-73); a training-data pipeline additionally needs a
real subword tokenizer.  This is classic BPE (Sennrich et al. 2016,
public domain algorithm) re-expressed for Spark:

- **train_bpe** — the corpus-sized work is ONE word-frequency
  aggregation (a single groupBy shuffle, map-side combined); the merge
  loop then runs driver-side over the BOUNDED top-``max_words``
  frequency table (the standard BPE training representation — identical
  cost at 5k docs or 100 TB, same bounded-driver-state pattern as the
  IVF/PQ codebook training in operators/similarity.py).

- **apply_bpe** — merges applied as a chain of literal ``replace``
  calls over a bracket-delimited symbol string, entirely inside
  whole-stage codegen: zero Python, zero shuffle, linear scan.  Each
  symbol is wrapped ``\\x01sym\\x02`` so a merge pattern
  ``\\x01a\\x02\\x01b\\x02`` never shares characters with an adjacent
  occurrence — a left-to-right non-overlapping ``replace`` therefore
  merges every adjacent disjoint pair exactly like the classic
  algorithm's global pair substitution.  This construction is engine-
  portable (DuckDB ``replace`` has the same semantics), which is what
  makes the bpe_apply driver gate value-checkable.

Scale: apply is embarrassingly parallel; the expression tree grows with
the merge count, so for vocabularies beyond a few hundred merges use
``apply_bpe_udf`` (broadcast merge ranks + Arrow-batched pandas, the
conventional fast path: per-word dynamic merging with a cache).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["train_bpe", "apply_bpe", "apply_bpe_udf", "bpe_segment_expr",
           "train_unigram", "apply_unigram", "EOW"]

# end-of-word marker symbol (single control char so it can never collide
# with corpus text, which the tokenizer lowercases + whitespace-splits)
EOW = "\x03"
_L, _R = "\x01", "\x02"

# \x01-\x03 are STRUCTURAL delimiters of the codegen apply path (and EOW
# itself); text containing them would corrupt token boundaries.  Every
# entry point (train + both apply paths) strips them first so all three
# see the identical cleaned corpus.
_CTRL_RE = "[\x01-\x03]"


def _clean_text(col: Column) -> Column:
    return F.regexp_replace(col, _CTRL_RE, "")


def train_bpe(df: DataFrame, text_col: str = "text", *,
              n_merges: int = 50, max_words: int = 50_000,
              min_pair_count: int = 2) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Distributed part: lowercase → whitespace-split → explode → word
    frequency (one shuffle).  The top ``max_words`` (by count, ties by
    word — deterministic) come back to the driver as the frequency
    table; the classic merge loop runs there.  Tie-break on equal pair
    counts is lexicographic, so training is fully deterministic.
    """
    freq_rows = (df.select(F.explode(
                     F.split(F.trim(F.lower(_clean_text(F.col(text_col)))),
                             r"\s+"))
                     .alias("w"))
                 .where(F.col("w") != "")
                 .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
                 .orderBy(F.desc("n"), "w")
                 .limit(max_words)
                 .collect())
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["w"]) + (EOW,): r["n"] for r in freq_rows}

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for word, n in vocab.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for word, n in vocab.items():
            out, i = [], 0
            while i < len(word):
                if (i + 1 < len(word) and word[i] == best[0]
                        and word[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def bpe_segment_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Pure-Catalyst BPE segmentation of one lowercase word Column:
    returns an array<string> of subword tokens (EOW marker attached to
    the final token).  Wrap every char, chain one literal ``replace``
    per merge, unwrap."""
    wrapped = F.concat(
        F.regexp_replace(word, "(.)", f"{_L}$1{_R}"),
        F.lit(f"{_L}{EOW}{_R}"))
    for a, b in merges:
        wrapped = F.replace(
            wrapped, F.lit(f"{_L}{a}{_R}{_L}{b}{_R}"),
            F.lit(f"{_L}{a}{b}{_R}"))
    inner = F.substring(wrapped, 2, F.length(wrapped) - F.lit(2))
    return F.split(inner, f"{_R}{_L}")


def apply_bpe(df: DataFrame, merges: list[tuple[str, str]],
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list, JVM-only.

    Output: (id, tokens array<string>, n_tokens) — one row per input
    row, no shuffle, whole-stage codegen throughout (plan pinned in
    tests/test_plans_sources.py).
    """
    words = F.filter(
        F.split(F.trim(F.lower(_clean_text(F.col(text_col)))), r"\s+"),
        lambda w: w != "")
    toks = F.flatten(
        F.transform(words, lambda w: bpe_segment_expr(w, merges)))
    return df.select(
        F.col(id_col).alias("id"),
        toks.alias("tokens"),
        F.size(toks).alias("n_tokens"))


def apply_bpe_udf(df: DataFrame, merges: list[tuple[str, str]],
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched apply for LARGE merge tables: broadcast merge ranks,
    per-word greedy rank merging with a word cache (the conventional BPE
    runtime).  Semantically identical to ``apply_bpe`` (same control-char
    strip, same NULL propagation, and the id column's exact input type is
    preserved — string/UUID doc ids work in both paths); use when the
    merge count would make a codegen expression chain unwieldy."""
    import re

    from pyspark.sql import types as T

    spark = df.sparkSession
    ranks_bc = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)})
    ctrl = re.compile(_CTRL_RE)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = ranks_bc.value
        cache: dict[str, list[str]] = {}

        def seg(word: str) -> list[str]:
            hit = cache.get(word)
            if hit is not None:
                return hit
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
            cache[word] = syms
            return syms

        for pdf in batches:
            rows = []
            for i, text in zip(pdf["id"], pdf["text"]):
                if text is None:
                    # parity with apply_bpe: split(NULL) propagates NULL
                    # (str(None) would fabricate tokens for 'none')
                    rows.append((i, None, None))
                    continue
                toks = [t for w in ctrl.sub("", str(text)).lower().split()
                        if w for t in seg(w)]
                rows.append((i, toks, len(toks)))
            yield pd.DataFrame(rows, columns=["id", "tokens", "n_tokens"])

    out_schema = T.StructType([
        T.StructField("id", df.schema[id_col].dataType, True),
        T.StructField("tokens", T.ArrayType(T.StringType()), True),
        T.StructField("n_tokens", T.IntegerType(), True),
    ])
    src = df.select(F.col(id_col).alias("id"),
                    F.col(text_col).alias("text"))
    return src.mapInPandas(encode, out_schema)


# ---------------------------------------------------------------------- #
# Unigram LM tokenizer (SentencePiece-style, Kudo 2018)                    #
# ---------------------------------------------------------------------- #
def train_unigram(df: DataFrame, text_col: str = "text", *,
                  vocab_size: int = 200, max_piece_len: int = 4,
                  iters: int = 2, max_words: int = 50_000,
                  seed_factor: int = 8) -> list[tuple[str, float]]:
    """Unigram-LM subword vocabulary (Kudo 2018, the SentencePiece
    unigram model — public algorithm), trained with hard (Viterbi) EM:

    1. ONE corpus shuffle builds the word-frequency table (identical
       first step to ``train_bpe``; everything after runs on the
       BOUNDED top-``max_words`` distinct-word table, so training cost
       is independent of corpus size past that one aggregation).
    2. Seed vocabulary = the ``seed_factor * vocab_size`` most frequent
       substrings of length ≤ ``max_piece_len`` (distributed substring
       explode + one groupBy on the word table) plus every single
       character (closure fallback).
    3. Each EM iteration broadcasts the current piece log-probs
       (bounded: ≤ seed_factor·vocab_size rows collected to the
       driver, the kmeans-centroid pattern), Viterbi-segments every
       distinct word in an Arrow-batched pass, re-counts pieces
       weighted by word frequency (one small groupBy), and re-derives
       log-probs ROUNDED to 9 dp — the train_quality_logreg rounding
       trick that keeps every later decision reproducible across
       partitionings and engines.
    4. Final vocabulary: top ``vocab_size`` pieces by (count, piece)
       plus all single characters, with log-probs from the last count
       pass.

    Returns a plain ``[(piece, logprob)]`` list (driver-bounded by
    construction), ready for ``apply_unigram`` / literal embedding.
    Hard-EM (Viterbi counts instead of forward-backward expectations)
    is the documented simplification: deterministic, and converges to
    the same vocabulary on corpora whose segmentations are unambiguous.
    """
    import math

    spark = df.sparkSession
    words = (df.select(F.explode(F.split(
                 F.trim(F.lower(_clean_text(F.col(text_col)))),
                 r"\s+")).alias("word"))
               .where(F.length("word") > 0)
               .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
               .orderBy(F.desc("freq"), "word").limit(max_words))
    words = words.persist()
    try:
        n_seed = seed_factor * vocab_size

        def substrs(batches):
            for pdf in batches:
                rows = []
                for word, freq in zip(pdf["word"], pdf["freq"]):
                    L = len(word)
                    for i in range(L):
                        for j in range(i + 1,
                                       min(i + max_piece_len, L) + 1):
                            rows.append((word[i:j], int(freq)))
                yield pd.DataFrame(rows, columns=["piece", "freq"])

        seed = (words.mapInPandas(substrs, "piece string, freq long")
                .groupBy("piece").agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), "piece").limit(n_seed))
        chars = (words.mapInPandas(
            lambda bs: (pd.DataFrame(
                [(c, int(f)) for w, f in zip(p["word"], p["freq"])
                 for c in set(w)], columns=["piece", "freq"])
                for p in bs), "piece string, freq long")
            .groupBy("piece").agg(F.sum("freq").alias("cnt")))
        vocab_df = seed.unionByName(chars).groupBy("piece").agg(
            F.max("cnt").alias("cnt"))

        def to_logprobs(rows: list) -> list[tuple[str, float]]:
            total = sum(c for _p, c in rows) or 1
            return [(p, round(math.log(c / total), 9))
                    for p, c in rows if c > 0]

        vocab = to_logprobs([(r["piece"], int(r["cnt"]))
                             for r in vocab_df.collect()])

        for _ in range(iters):
            counts = _viterbi_counts(words, vocab, max_piece_len)
            rows = [(r["piece"], int(r["cnt"])) for r in counts.collect()]
            # chars must survive even with zero Viterbi count (closure)
            seen = {p for p, _c in rows}
            rows += [(p, 1) for p, _lp in vocab
                     if len(p) == 1 and p not in seen]
            vocab = to_logprobs(rows)

        multi = sorted([pc for pc in vocab if len(pc[0]) > 1],
                       key=lambda pc: (-pc[1], pc[0]))[:vocab_size]
        singles = [pc for pc in vocab if len(pc[0]) == 1]
        return sorted(multi + singles)
    finally:
        words.unpersist()


def _viterbi_segment(word: str, probs: dict[str, float],
                     max_len: int) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs: standard
    Viterbi over character positions; ties broken toward FEWER pieces,
    then lexicographically smaller piece at each boundary — total
    determinism under the rounded log-probs.  Characters absent from
    the vocabulary fall back to a -1e9 floor so segmentation is total.
    """
    n = len(word)
    NEG = -1e9
    # best[i] = (score, n_pieces, piece_ending_here)
    best: list[tuple] = [(0.0, 0, "")] + [(None, 0, "")] * n
    for j in range(1, n + 1):
        cand = None
        for i in range(max(0, j - max_len), j):
            if best[i][0] is None:
                continue
            piece = word[i:j]
            lp = probs.get(piece)
            if lp is None:
                if j - i > 1:
                    continue
                lp = NEG
            sc = (best[i][0] + lp, best[i][1] + 1, piece)
            if cand is None or (sc[0], -sc[1], _neg_lex(sc[2])) > \
                    (cand[0], -cand[1], _neg_lex(cand[2])):
                cand = sc
        best[j] = cand if cand is not None else (None, 0, "")
    out: list[str] = []
    j = n
    while j > 0:
        piece = best[j][2]
        out.append(piece)
        j -= len(piece)
    return out[::-1]


class _neg_lex(str):
    """Reverse lexicographic comparison wrapper: makes the SMALLER
    string win inside a max() tuple comparison."""

    def __lt__(self, other):  # noqa: D105
        return str.__gt__(self, other)

    def __gt__(self, other):  # noqa: D105
        return str.__lt__(self, other)


def _viterbi_counts(words: DataFrame, vocab: list[tuple[str, float]],
                    max_len: int) -> DataFrame:
    probs = dict(vocab)

    def count(batches):
        for pdf in batches:
            acc: dict[str, int] = {}
            for word, freq in zip(pdf["word"], pdf["freq"]):
                for piece in _viterbi_segment(word, probs, max_len):
                    acc[piece] = acc.get(piece, 0) + int(freq)
            yield pd.DataFrame({"piece": list(acc),
                                "cnt": list(acc.values())})

    return (words.mapInPandas(count, "piece string, cnt long")
            .groupBy("piece").agg(F.sum("cnt").alias("cnt")))


def apply_unigram(df: DataFrame, vocab: list[tuple[str, float]],
                  text_col: str = "text", id_col: str = "doc_id", *,
                  max_piece_len: int | None = None,
                  out_col: str = "tokens") -> DataFrame:
    """Tokenize with a unigram vocabulary: per word, the Viterbi-best
    segmentation under the piece log-probs (same tie rules as
    training).  Arrow-batched pandas over a broadcast piece dict — the
    ``apply_bpe_udf`` fast-path pattern; embarrassingly parallel, one
    corpus pass.  Returns (id, n_tokens, tokens array<string>).

    Contract parity with ``apply_bpe_udf``: the id column's exact input
    type is preserved (string/UUID doc ids work), and NULL text
    propagates as (NULL tokens, NULL n_tokens) — an empty STRING still
    tokenizes to an empty list with n_tokens=0."""
    from pyspark.sql import types as T

    probs = dict(vocab)
    max_len = max_piece_len or max((len(p) for p in probs), default=1)

    src = df.select(F.col(id_col).alias("id"),
                    F.trim(F.lower(_clean_text(F.col(text_col))))
                     .alias("__t"))

    def tok(batches):
        for pdf in batches:
            rows = []
            for i, text in zip(pdf["id"], pdf["__t"]):
                if text is None:
                    rows.append((i, None, None))
                    continue
                pieces: list[str] = []
                for word in text.split():
                    pieces.extend(
                        _viterbi_segment(word, probs, max_len))
                rows.append((i, pieces, len(pieces)))
            yield pd.DataFrame(rows, columns=["id", "tokens", "n_tokens"])

    out_schema = T.StructType([
        T.StructField("id", df.schema[id_col].dataType, True),
        T.StructField("tokens", T.ArrayType(T.StringType()), True),
        T.StructField("n_tokens", T.IntegerType(), True),
    ])
    out = src.mapInPandas(tok, out_schema)
    return out.select("id", "n_tokens", F.col("tokens").alias(out_col))
