"""Dataset-curation operators for training-data pipelines: deterministic
splits and sequence packing.

At 100 TB, ``df.randomSplit`` is the wrong tool for train/val/test: the
assignment must be (a) reproducible across reruns and engines, (b) stable
under repartitioning and data append — a document keeps its split forever
— and (c) shuffle-free.  ``hash_split`` derives the split from
``md5(salt:id)`` alone: a pure projection, no state, no shuffle, no RNG
seed plumbing; re-running over a grown corpus never reassigns an existing
document.

``pack_sequences`` is context-window packing (grouping short documents
into ≤ max_tokens training sequences).  TRUE first-fit packing is
sequential — a global scan — so the scalable formulation shards the
corpus by a hash of the id (shards are independent ⇒ embarrassingly
parallel; one window per shard) and packs each shard with the standard
cumulative-sum rule: bin = floor((cumsum - t) / max).  A document longer
than ``max_tokens`` owns its bin.  Bins can exceed max_tokens only by
the one straddling document — callers that need hard caps truncate that
document downstream.  The output is deterministic (shard and in-shard
order derive from ids), which the DuckDB oracle in the gate verifies
value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.scalar import round0

__all__ = ["hash_split", "split_label", "split_leakage",
           "pack_sequences", "stratified_sample", "percentile_cut",
           "percentile_cut_by_group",
           "token_budget_mix", "contamination", "contamination_hash",
           "contamination_bloom", "contamination_fuzzy", "ngram_novelty",
           "ngram_novelty_vs_bloom",
           "chunk_documents", "temperature_sample", "cap_per_group",
           "global_shuffle", "importance_weights",
           "canonicalize_url", "url_dedup"]

_BUCKETS = 10_000


def _hash_bucket(id_col: str, salt: str) -> F.Column:
    """Uniform bucket in [0, 10000) from md5(salt:id) — the first 8 hex
    chars parsed base-16, exactly reproducible in any engine with md5."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % F.lit(_BUCKETS))


def hash_split(df: DataFrame, id_col: str,
               splits: dict[str, float] | None = None,
               salt: str = "v1",
               out_col: str = "split") -> DataFrame:
    """Assign each row a deterministic split label by hashed id.

    ``splits`` maps label → fraction (must sum to ≤ 1; any remainder
    becomes the last label's tail, so the default 0.8/0.1/0.1 is exact).
    Pure projection: no shuffle, no RNG.  Changing ``salt`` re-deals the
    whole assignment; keeping it stable makes appends incremental.
    """
    return df.withColumn(out_col, split_label(id_col, splits, salt))


def split_label(id_col: str, splits: dict[str, float] | None = None,
                salt: str = "v1") -> F.Column:
    """The split-assignment EXPRESSION behind ``hash_split`` — a pure
    projection on the id alone, so any frame carrying an id column can
    derive its split label without joining the corpus (``split_leakage``
    labels near-dup pairs this way)."""
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    if not splits or any(v < 0 for v in splits.values()):
        raise ValueError("splits must be positive fractions")
    if sum(splits.values()) > 1 + 1e-9:
        raise ValueError("split fractions exceed 1")
    bucket = _hash_bucket(id_col, salt)
    expr = None
    acc = 0.0
    labels = list(splits.items())
    for name, frac in labels[:-1]:
        acc += frac
        cond = bucket < F.lit(int(round(acc * _BUCKETS)))
        expr = F.when(cond, F.lit(name)) if expr is None else \
            expr.when(cond, F.lit(name))
    last = labels[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(F.lit(last))


def split_leakage(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", *,
                  splits: dict[str, float] | None = None,
                  salt: str = "v1", num_hashes: int = 64,
                  bands: int = 16,
                  threshold: float = 0.5) -> DataFrame:
    """Train/test LEAKAGE audit: near-duplicate pairs that STRADDLE the
    deterministic hash split — an eval row with a near-copy in train is
    how models "memorize the test set" even after external-benchmark
    decontamination (the split is internal; ``contamination`` can't see
    it).

    Cost is exactly one banded MinHash-LSH near-dup pass
    (``dedup.minhash_lsh_pairs`` — bucketed, never all-pairs); the
    split labels are pure PROJECTIONS of the pair ids (md5 bucket, via
    ``split_label``), so no join against the corpus is ever needed and
    the post-filter touches only the near-dup pairs themselves.
    Returns (id_a, id_b, split_a, split_b, jaccard) for pairs whose
    sides land in different splits.
    """
    from .dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(df, text_col, id_col,
                              num_hashes=num_hashes, bands=bands,
                              threshold=threshold)
    out = pairs.select(
        "id_a", "id_b",
        split_label("id_a", splits, salt).alias("split_a"),
        split_label("id_b", splits, salt).alias("split_b"),
        "jaccard")
    return out.where(F.col("split_a") != F.col("split_b"))


def pack_sequences(df: DataFrame, id_col: str, tokens_col: str,
                   max_tokens: int, n_shards: int = 64,
                   salt: str = "v1") -> DataFrame:
    """Group rows into training-sequence bins of ~``max_tokens``.

    Adds ``shard`` (hash of id mod ``n_shards``) and ``bin`` (packing
    index within the shard).  Rows pack in hashed-id order within their
    shard via one cumulative-sum window per shard — the only shuffle is
    the shard hash partition, and shards are independent so the plan
    parallelizes to any cluster width.  bin = floor((cum - t) / max):
    each document lands in the bin its first token falls into; an
    oversize document therefore owns at least one whole bin.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    shard = _hash_bucket(id_col, salt) % F.lit(n_shards)
    # pack in HASHED-id order (ties by id), like token_budget_mix: raw
    # id order would pack temporally/source-adjacent documents into the
    # same training bins — exactly the ingest-order correlation the
    # hash shuffle exists to break
    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    w = (Window.partitionBy("shard").orderBy(h, id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(tokens_col).over(w)
    return (df.withColumn("shard", shard)
            .withColumn("bin",
                        F.floor((cum - F.col(tokens_col))
                                / F.lit(max_tokens)).cast("long")))


def stratified_sample(df: DataFrame, strata_col: str, id_col: str,
                      fractions: dict[str, float],
                      default_fraction: float = 0.0,
                      salt: str = "v1") -> DataFrame:
    """Deterministic per-stratum downsampling by hashed id.

    Keeps a row iff its md5 bucket falls under its stratum's fraction
    (strata absent from ``fractions`` get ``default_fraction``).  Same
    contract as ``hash_split``: a pure shuffle-free projection,
    reproducible across engines/reruns, and stable under appends — a
    kept document stays kept as the corpus grows.  This is the sampling
    primitive for corpus mixing ("keep 10% of crawl, 100% of books"):
    unlike ``df.sampleBy`` it needs no RNG seed plumbing and never
    reshuffles the selection when partitioning changes.
    """
    if any(v < 0 or v > 1 for v in fractions.values()) or \
            not 0 <= default_fraction <= 1:
        raise ValueError("fractions must be in [0, 1]")
    bucket = _hash_bucket(id_col, salt)
    thresh = F.lit(int(round(default_fraction * _BUCKETS)))
    for name, frac in fractions.items():
        thresh = F.when(F.col(strata_col) == name,
                        F.lit(int(round(frac * _BUCKETS)))).otherwise(thresh)
    return df.where(bucket < thresh)


def token_budget_mix(df: DataFrame, source_col: str, tokens_col: str,
                     id_col: str, budgets: dict[str, int],
                     n_shards: int = 1, salt: str = "v1") -> DataFrame:
    """Select documents per source up to a token budget — the "data
    mixture" step that turns per-source token targets (e.g. 30% web,
    20% code, ...) into a concrete document set.

    Documents are taken in hashed-id order (deterministic, unbiased by
    ingest order) until the source's budget is exhausted; the straddling
    document is included, so each source overshoots by < 1 document.
    Sources absent from ``budgets`` are dropped.

    Scale: one window per (source, shard).  With ``n_shards=1`` the
    cumulative sum over a popular source is a single-partition scan —
    exact, but the partition must fit one executor.  For 100 TB set
    ``n_shards`` so each shard is executor-sized: the budget divides
    evenly across shards (shard = hash(id) % n_shards, per-shard budget
    = budget/n_shards) and shards select independently in parallel.
    Sharding changes WHICH documents are picked (still deterministically)
    but keeps each source's total within n_shards straddling documents
    of the target.

    The output carries a ``shard`` column (the document's hash shard,
    constant 0 when ``n_shards=1``): it is load-bearing for the sharded
    formulation — downstream writers partition on it to keep each
    selection stream independent — and is part of the public schema the
    gate oracle selects.
    """
    if any(v < 0 for v in budgets.values()):
        raise ValueError("budgets must be non-negative")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if not budgets:
        raise ValueError("budgets must name at least one source")
    src = F.col(source_col)
    budget_expr = None
    for name, b in budgets.items():
        per_shard = F.lit(b / n_shards)
        budget_expr = (F.when(src == name, per_shard) if budget_expr is None
                       else budget_expr.when(src == name, per_shard))
    budget_expr = budget_expr.otherwise(F.lit(-1.0))  # unknown source: drop
    h = F.md5(F.concat(F.lit(f"{salt}:"),
                       F.col(id_col).cast("string")))
    shard = _hash_bucket(id_col, salt) % F.lit(n_shards)
    w = (Window.partitionBy(source_col, "shard").orderBy(h)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(tokens_col).over(w)
    return (df.withColumn("shard", shard)
            .withColumn("_cum", cum)
            .withColumn("_budget", budget_expr)
            .where((F.col("_budget") >= 0)
                   & (F.col("_cum") - F.col(tokens_col) < F.col("_budget")))
            .drop("_cum", "_budget"))


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", max_tokens: int = 64,
                    overlap: int = 8) -> DataFrame:
    """Split documents into overlapping ~context-window chunks.

    One row per chunk: (id, chunk_idx, chunk_text, n_chunk_tokens).
    Chunk *i* starts at token ``i·(max_tokens − overlap)`` and carries up
    to ``max_tokens`` tokens, so consecutive chunks share ``overlap``
    tokens (the standard long-document → training-sequence split).  The
    whole operator is a row-local expression + ``explode`` — no shuffle,
    no Python; output size is corpus tokens × (1 + overlap/stride), the
    unavoidable duplication cost of overlap.  ``chunk_idx = start/stride``
    so the id is derivable (and oracle-reproducible) without ordinality.
    """
    if max_tokens <= 0 or not 0 <= overlap < max_tokens:
        raise ValueError("need max_tokens > 0 and 0 <= overlap < max_tokens")
    from .text import tokenize

    from .dedup import let

    stride = max_tokens - overlap

    def chunks(toks: F.Column) -> F.Column:
        n = F.size(toks)
        starts = F.sequence(F.lit(0), F.greatest(n - overlap - 1, F.lit(0)),
                            F.lit(stride))
        return F.transform(
            starts,
            lambda s: F.struct(
                (s / stride).cast("long").alias("chunk_idx"),
                F.array_join(F.slice(toks, s + 1, max_tokens), " ")
                 .alias("chunk_text"),
                F.least(n - s, F.lit(max_tokens)).alias("n_chunk_tokens")))

    exploded = (df.select(id_col,
                          F.explode(let(tokenize(text_col), chunks))
                           .alias("_c")))
    return exploded.select(
        id_col,
        F.col("_c.chunk_idx").alias("chunk_idx"),
        F.col("_c.chunk_text").alias("chunk_text"),
        F.col("_c.n_chunk_tokens").alias("n_chunk_tokens"))


def contamination(df: DataFrame, bench: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 8) -> DataFrame:
    """Benchmark decontamination: count each document's distinct word
    ``n``-grams that appear anywhere in the benchmark set ``bench``
    (same ``text_col``).  Returns (id, n_contaminated, contaminated).

    The standard eval-leakage check (n=8..13 word grams).  Shape at
    scale: benchmark suites are tiny (10^5-10^6 grams) next to a 100 TB
    corpus, so the gram join broadcasts the benchmark side — the corpus
    is never shuffled, only flatMap'd to (id, gram) and partially
    aggregated back to one row per doc; the post-join groupBy moves hit
    rows only (rare by construction).  Distinct grams per side, so a
    phrase repeated inside one document counts once.
    """
    from .dedup import let
    from .text import _ngram_col, tokenize

    def grams(frame: DataFrame, *cols: str) -> DataFrame:
        # let-bind tokenize so the split regex runs once per row, not
        # once per gram position (no CSE inside HOF lambda bodies)
        g = let(tokenize(text_col),
                lambda t: F.array_distinct(_ngram_col(t, n)))
        return frame.select(*cols, F.explode(g).alias("gram"))

    bench_grams = grams(bench).distinct()
    doc_grams = grams(df, id_col)
    hits = (doc_grams
            .join(F.broadcast(bench_grams), "gram")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_contaminated")))
    return (df.select(id_col)
            .join(hits, id_col, "left")
            .select(id_col,
                    F.coalesce("n_contaminated", F.lit(0)).cast("long")
                     .alias("n_contaminated"))
            .withColumn("contaminated", F.col("n_contaminated") > 0))


def percentile_cut(df: DataFrame, score_col: str, p: float = 0.1,
                   round_dp: int = 6) -> tuple[DataFrame, float]:
    """Corpus-RELATIVE quality cut: drop rows whose ``score_col`` falls
    below the exact ``p``-quantile of the corpus — "remove the worst
    decile" instead of a hand-tuned absolute threshold, the standard
    way quality classifiers are actually applied to a crawl.

    Two passes: one percentile aggregate reduced to a driver scalar
    (rounded to ``round_dp`` so engines agree on the boundary), one
    filter scan with the threshold inlined.  ``percentile`` is EXACT
    (linear interpolation, identical to quantile_cont) — it buffers the
    column per partition, fine to ~10^8 rows; at 100 TB swap in
    ``approx_percentile(score, p, accuracy)`` for a bounded-memory
    sketch with the same two-pass shape (the gate uses the exact form
    so the oracle can replay it bit-for-bit).

    Returns (survivors, threshold).
    """
    if not 0 < p < 1:
        raise ValueError(f"p must be in (0, 1), got {p}")
    thr = df.select(
        F.round(F.percentile(F.col(score_col), F.lit(float(p))), round_dp)
        .alias("t")).collect()[0]["t"]
    if thr is None:
        raise ValueError("percentile undefined: empty input or all-null "
                         f"{score_col}")
    return df.where(F.col(score_col) >= F.lit(float(thr))), float(thr)


def percentile_cut_by_group(df: DataFrame, score_col: str,
                            group_col: str, p: float = 0.1,
                            round_dp: int = 6
                            ) -> tuple[DataFrame, DataFrame]:
    """PER-GROUP corpus-relative quality cut: drop rows below their own
    group's ``p``-quantile of ``score_col`` — how curation thresholds
    are actually applied in practice (a fixed global cut over-prunes
    low-scoring-but-wanted domains/languages and under-prunes high
    ones; "worst decile PER domain" keeps the mix).

    Shape at scale: ONE grouped percentile aggregate reduces the corpus
    to a k-row threshold table (k = #groups — domains/languages number
    in the thousands at most), which then BROADCAST-joins back for the
    filter scan.  Two corpus passes total, no row ever shuffles on the
    group key except inside the partial-aggregated percentile.  Same
    engine-portable exact ``percentile`` ≡ ``quantile_cont`` trick as
    ``percentile_cut`` (thresholds rounded to ``round_dp``); at 100 TB
    swap in ``approx_percentile`` with the identical two-pass shape.
    Groups where the percentile is undefined (all-null scores) get a
    NULL threshold and contribute no survivors — a loud count drop, not
    a silent keep-all.

    Returns (survivors, thresholds) — thresholds is the k-row
    (group, threshold) table for audit/export.
    """
    if not 0 < p < 1:
        raise ValueError(f"p must be in (0, 1), got {p}")
    thr = (df.groupBy(group_col)
             .agg(F.round(F.percentile(F.col(score_col), F.lit(float(p))),
                          round_dp).alias("threshold")))
    kept = (df.join(F.broadcast(thr), group_col)
              .where(F.col(score_col) >= F.col("threshold"))
              .drop("threshold"))
    return kept, thr


def contamination_hash(df: DataFrame, bench: DataFrame,
                       text_col: str = "text", id_col: str = "doc_id",
                       n: int = 8) -> DataFrame:
    """``contamination`` with a 64-bit HASH PREFILTER — the shape for
    benchmark suites too large to broadcast as gram strings.

    Two-stage, result IDENTICAL to ``contamination`` (the gate shares
    its oracle):

    1. prefilter: corpus grams join a broadcast set of ``xxhash64``
       gram hashes (8 bytes each — ~6× leaner than the strings, the
       same memory trick as the runtime Bloom filters Spark injects
       for shuffle joins, but exact-by-construction after stage 2);
    2. exact verify: the SURVIVORS (true hits + rare 64-bit collisions)
       re-join the benchmark on the gram string.  Survivor volume is
       proportional to CONTAMINATION volume, not bounded by the
       benchmark, so the verify join carries NO broadcast hint: AQE's
       runtime-size check (``spark.sql.adaptive.autoBroadcastJoinThreshold``)
       broadcasts the survivors when they really are tiny and falls
       back to a shuffle join when a heavily contaminated corpus makes
       them large — an unconditional hint here could OOM the driver.

    At 100 TB: corpus side stays flatMap + partial-agg exactly like
    ``contamination``; the benchmark side can now be 10^8+ grams
    (hash set ~1 GB broadcast) instead of being capped by string
    broadcast size.
    """
    from .dedup import let
    from .text import _ngram_col, tokenize

    def grams(frame: DataFrame, *cols: str) -> DataFrame:
        g = let(tokenize(text_col),
                lambda t: F.array_distinct(_ngram_col(t, n)))
        return frame.select(*cols, F.explode(g).alias("gram"))

    bench_grams = grams(bench).distinct()
    bench_hashes = bench_grams.select(
        F.xxhash64("gram").alias("_gh")).distinct()
    cand = (grams(df, id_col)
            .withColumn("_gh", F.xxhash64("gram"))
            .join(F.broadcast(bench_hashes), "_gh")
            .drop("_gh"))
    hits = (bench_grams.join(cand, "gram")  # AQE sizes the build side
            .groupBy(id_col)
            .agg(F.count("*").alias("n_contaminated")))
    return (df.select(id_col)
            .join(hits, id_col, "left")
            .select(id_col,
                    F.coalesce("n_contaminated", F.lit(0)).cast("long")
                     .alias("n_contaminated"))
            .withColumn("contaminated", F.col("n_contaminated") > 0))


# Driver-materialization ceiling for the probe chain's word table:
# 2^26 bits = 2M word rows (~32 MB collected).  The chain exists for
# BROADCAST-class filters; a filter past this belongs on the executor
# side (sketches.bloom_lookup's join form), not in a driver collect.
_PROBE_CHAIN_MAX_BITS = 1 << 26


def _bloom_probe_chain(cand: DataFrame, value_col: str,
                       words: DataFrame, *, m_bits: int,
                       k: int) -> DataFrame:
    """Filter ``cand`` to rows whose ``value_col`` has ALL k Bloom bits
    set in ``words`` — k chained map-side BROADCAST hash joins, the
    corpus side never shuffled.  The word table is materialized ONCE on
    the driver first (bounded by m_bits/32 rows — it is broadcast
    anyway, so this adds no memory class, and it stops the k per-join
    subtrees from re-executing the whole filter-build k times).
    Addressing comes from sketches.bloom_position — the single source
    of the formula the filter builder and the oracles replay.

    The word table must be UNGROUPED (columns exactly {word_idx, word},
    one row per word): a grouped table (e.g. ``read_bloom_words`` over
    a grouped store) has duplicate word_idx rows across groups, which
    would silently multiply candidate rows through the k chained joins
    — refused loudly here, as is an m_bits past the driver-collect
    ceiling."""
    from .sketches import BLOOM_WORD_BITS, bloom_position

    if m_bits > _PROBE_CHAIN_MAX_BITS:
        raise ValueError(
            f"m_bits={m_bits} exceeds the probe-chain driver ceiling "
            f"({_PROBE_CHAIN_MAX_BITS}); use sketches.bloom_lookup's "
            "executor-side join form for filters this large")
    if set(words.columns) != {"word_idx", "word"}:
        raise ValueError(
            "probe chain needs an UNGROUPED word table (columns "
            f"exactly [word_idx, word]); got {sorted(words.columns)} — "
            "a grouped store's words would multiply candidates "
            "through the chained joins")
    spark = words.sparkSession
    rows = words.select("word_idx", "word").collect()
    if len({r["word_idx"] for r in rows}) != len(rows):
        raise ValueError(
            "duplicate word_idx rows in the probe-chain word table "
            "(grouped or unmerged store?) — bit_or-merge per word_idx "
            "first (sketches.read_bloom_words on an ungrouped store)")
    local = spark.createDataFrame(rows, "word_idx int, word long")
    for i in range(k):
        pos = bloom_position(F.col(value_col), i, m_bits=m_bits)
        wi = local.select(F.col("word_idx").alias(f"_wi{i}"),
                          F.col("word").alias(f"_w{i}"))
        cand = (cand.withColumn(f"_p{i}", pos)
                .join(F.broadcast(wi),
                      F.expr(f"CAST(_p{i} div {BLOOM_WORD_BITS} AS INT)")
                      == F.col(f"_wi{i}"))
                .where(F.col(f"_w{i}").bitwiseAND(
                    F.expr(f"shiftleft(1L, CAST(_p{i} %"
                           f" {BLOOM_WORD_BITS} AS INT))")) != 0)
                .drop(f"_p{i}", f"_wi{i}", f"_w{i}"))
    return cand


def contamination_bloom(df: DataFrame, bench: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 8, *, m_bits: int = 1 << 18,
                        k: int = 4) -> DataFrame:
    """``contamination`` with a BLOOM-FILTER PREFILTER — the third (and
    leanest) broadcast tier.  Result IDENTICAL to ``contamination``
    (the gate shares its oracle):

    1. prefilter: the benchmark grams become a packed-word Bloom filter
       (sketches.py:bloom_words — m_bits/32 longs total, independent of
       gram count or gram string length) and each corpus gram is probed
       with ``k`` chained BROADCAST hash joins against the word table,
       dropping grams with any unset bit.  No false negatives (a bench
       gram always survives); false positives at ~(fill)^k join stage 2.
    2. exact verify: survivors re-join the benchmark on the gram string
       — AQE sizes the build side, exactly as in ``contamination_hash``
       (an unconditional hint could OOM on a contaminated corpus).

    Broadcast ladder at 100 TB: gram STRINGS (``contamination``,
    ~50 B/gram) → xxhash64 set (``contamination_hash``, 8 B/gram) →
    Bloom words (here, ~1.2 BITS/gram at 1% FPR) — three orders of
    magnitude, so benchmark suites of 10^9+ grams still broadcast while
    the corpus side stays a flatMap + k map-side joins, never shuffled
    before the survivor aggregation."""
    from .dedup import let
    from .sketches import bloom_words
    from .text import _ngram_col, tokenize

    def grams(frame: DataFrame, *cols: str) -> DataFrame:
        g = let(tokenize(text_col),
                lambda t: F.array_distinct(_ngram_col(t, n)))
        return frame.select(*cols, F.explode(g).alias("gram"))

    bench_grams = grams(bench).distinct()
    words = bloom_words(bench_grams, "gram", m_bits=m_bits, k=k)
    cand = _bloom_probe_chain(grams(df, id_col), "gram", words,
                              m_bits=m_bits, k=k)
    hits = (bench_grams.join(cand, "gram")  # AQE sizes the build side
            .groupBy(id_col)
            .agg(F.count("*").alias("n_contaminated")))
    return (df.select(id_col)
            .join(hits, id_col, "left")
            .select(id_col,
                    F.coalesce("n_contaminated", F.lit(0)).cast("long")
                     .alias("n_contaminated"))
            .withColumn("contaminated", F.col("n_contaminated") > 0))


def ngram_novelty(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 8, *,
                  round_dp: int | None = None) -> DataFrame:
    """Per-document n-gram NOVELTY: of a document's distinct word
    ``n``-grams, how many occur in NO earlier document (first occurrence
    = the corpus-wide minimum ``id_col``)?  The curation signal behind
    the "how much of this shard is new text" triage (cf. Lee et al.
    2021, Deduplicating Training Data Makes Language Models Better —
    novelty mass is the complement of their duplicate-text fraction).

    Output: (id, n_grams, n_novel, novelty) with ``novelty =
    n_novel / n_grams`` — ONE IEEE division of exact integers, left
    UNROUNDED by default because it is already bit-replayable and the
    dyadic ratios rounding would touch (1/128 at 6 dp is a genuine
    round-half tie) are exactly where engines' tie policies diverge;
    NULL for documents shorter than ``n`` tokens.

    Scale shape: one corpus scan; a gram-keyed partial aggregation
    (min(id) — the exact-dedup shuffle class); then everything runs on
    doc-count-sized tables — first-occurrence counts re-aggregate by
    doc id and join the per-doc gram counts, so no corpus-sized join
    ever happens (the naive form re-joins every (doc, gram) pair
    against the first-occurrence table)."""
    from .dedup import let
    from .text import _ngram_col, tokenize

    g = let(tokenize(text_col), lambda t: F.array_distinct(_ngram_col(t, n)))
    doc_grams = df.select(F.col(id_col), F.explode(g).alias("gram"))
    n_grams = (doc_grams.groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_grams")))
    firsts = (doc_grams.groupBy("gram")
              .agg(F.min(id_col).alias("_first_id")))
    novel = (firsts.groupBy(F.col("_first_id").alias(id_col))
             .agg(F.count(F.lit(1)).alias("n_novel")))
    frac = (F.col("n_novel").cast("double")
            / F.col("n_grams").cast("double"))
    novelty = F.when(
        F.col("n_grams") > 0,
        frac if round_dp is None else round0(frac, round_dp))
    return (df.select(id_col)
            .join(n_grams, id_col, "left")
            .join(novel, id_col, "left")
            .select(id_col,
                    F.coalesce("n_grams", F.lit(0)).cast("long")
                     .alias("n_grams"),
                    F.coalesce("n_novel", F.lit(0)).cast("long")
                     .alias("n_novel"))
            .withColumn("novelty", novelty))


def ngram_novelty_vs_bloom(df: DataFrame, words: DataFrame,
                           text_col: str = "text",
                           id_col: str = "doc_id", n: int = 8, *,
                           m_bits: int = 1 << 20,
                           k: int = 4) -> DataFrame:
    """INCREMENTAL novelty: per document, how many of its distinct word
    ``n``-grams are DEFINITELY NEW against a historical Bloom filter
    (``words`` from sketches.py:bloom_words / read_bloom_words over the
    grams already ingested)?  The per-epoch "how much of today's crawl
    is new text" triage — answered at word-table cost, never re-reading
    history (pair with the persisted Bloom store + bloom_sketch_sink).

    A gram failing any of its k probes is certainly unseen (Bloom has
    no false negatives), so ``n_new`` is a LOWER bound on true novelty
    and ``n_seen`` an upper bound on overlap — off only by the filter's
    false-positive mass, which bloom_stats quantifies.  Output: (id,
    n_grams, n_seen, n_new, new_frac) — counts are exact integers,
    ``new_frac = n_new / n_grams`` one unrounded IEEE division (the
    ngram_novelty determinism contract).

    ``m_bits``/``k`` MUST match the filter's build parameters (defaults
    mirror ``bloom_words``' own — a mismatched modulus probes the wrong
    bits and silently voids the no-false-negative contract).

    Scale shape: identical to contamination_bloom's stage 1 — the
    corpus is exploded to grams and probed with k chained BROADCAST
    joins (never shuffled); the only aggregations are doc-keyed."""
    from .dedup import let
    from .text import _ngram_col, tokenize

    g = let(tokenize(text_col), lambda t: F.array_distinct(_ngram_col(t, n)))
    doc_grams = df.select(F.col(id_col), F.explode(g).alias("gram"))
    n_grams = (doc_grams.groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_grams")))
    seen = _bloom_probe_chain(doc_grams, "gram", words,
                              m_bits=m_bits, k=k)
    n_seen = seen.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_seen"))
    out = (df.select(id_col)
           .join(n_grams, id_col, "left")
           .join(n_seen, id_col, "left")
           .select(id_col,
                   F.coalesce("n_grams", F.lit(0)).cast("long")
                    .alias("n_grams"),
                   F.coalesce("n_seen", F.lit(0)).cast("long")
                    .alias("n_seen")))
    out = out.withColumn("n_new", F.col("n_grams") - F.col("n_seen"))
    return out.withColumn(
        "new_frac",
        F.when(F.col("n_grams") > 0,
               F.col("n_new").cast("double")
               / F.col("n_grams").cast("double")))


def contamination_fuzzy(df: DataFrame, bench: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        bench_id_col: str | None = None, *,
                        num_hashes: int = 64, bands: int = 16,
                        k: int = 5,
                        threshold: float = 0.5) -> DataFrame:
    """FUZZY benchmark decontamination: corpus documents that are
    NEAR-duplicates of a benchmark row — the leak the exact forms
    cannot see.  ``contamination`` / ``contamination_hash`` match
    verbatim word n-grams, so a paraphrased, reformatted, or lightly
    edited eval question slips both; near-dup similarity (banded
    MinHash-LSH + exact shingle-Jaccard verify, the same machinery as
    ``split_leakage``) catches it.

    Returns (``id_col``, bench_id, jaccard): one row per (corpus doc,
    benchmark doc) pair with exact 5-char-shingle Jaccard >=
    ``threshold``.  Compose with ``contamination`` for the standard
    two-layer decontamination (exact n-gram + fuzzy near-dup).

    Scale shape (``dedup.minhash_lsh_pairs_vs``): the benchmark side is
    broadcast (banded rows, signatures, shingles — all bounded by the
    benchmark's size), the corpus is scanned exactly once, and NO
    corpus×corpus pair is ever formed — unlike a union+self-join, whose
    cost at 100 TB is the entire dedup workload.  The verify joins stay
    AQE-sized because survivor volume is proportional to contamination,
    the same reasoning as ``contamination_hash``'s verify join.
    """
    from .dedup import minhash_lsh_pairs_vs

    pairs = minhash_lsh_pairs_vs(df, bench, text_col, id_col,
                                 bench_id_col, num_hashes=num_hashes,
                                 bands=bands, k=k, threshold=threshold)
    out = pairs.select(F.col("id_a").alias(id_col),
                       F.col("id_b").alias("bench_id"),
                       "jaccard")
    out._zdb_cache_handles = getattr(pairs, "_zdb_cache_handles", [])
    return out


def temperature_sample(df: DataFrame, source_col: str, id_col: str, *,
                       alpha: float = 0.5, target_docs: int,
                       salt: str = "v1") -> DataFrame:
    """Temperature-weighted mixture sampling: draw ~``target_docs``
    documents with per-source allocation ∝ ``count^alpha`` — the
    standard rebalance that up-weights small sources relative to
    proportional sampling (alpha=1 is proportional, alpha=0 is uniform
    across sources; multilingual/multi-corpus recipes typically use
    0.3–0.7).

    Deterministic, not random: a doc is kept iff its md5 hash bucket
    falls below ``floor(p_source · 10000)``, where
    ``p_source = min(1, target·w_s / n_s)`` and ``w_s = n_s^alpha / Σ
    n_t^alpha``.  Same hash recipe as every other curation operator, so
    membership is stable under ingest order, re-runs, and engine — and
    an engine with md5 can reproduce the exact sample, which the gate
    oracle does.  Sources with p=1 are taken whole (target beyond their
    size); each source's realized count differs from expectation only
    by hash-bucket granularity (±n_s/10000).

    Execution: one tiny groupBy for counts, weights computed ON the
    counts frame (one row per source — the cross join against its own
    1-row sum is trivial), broadcast back, then a narrow filter over
    the corpus.  One shuffle (the counts), one broadcast, no sort.

    Output: the sampled rows with ``sample_p`` (the source's inclusion
    probability) attached.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if target_docs <= 0:
        raise ValueError(f"target_docs must be positive, got {target_docs}")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    w = F.pow(F.col("_n").cast("double"), F.lit(float(alpha)))
    z = counts.agg(F.sum(w).alias("_z"))
    p = F.least(F.lit(1.0),
                F.lit(float(target_docs)) * w / F.col("_z") / F.col("_n"))
    probs = (counts.crossJoin(z)
             .select(source_col, p.alias("sample_p"),
                     F.floor(p * F.lit(_BUCKETS)).cast("long").alias("_thr")))
    return (df.join(F.broadcast(probs), source_col)
            .where(_hash_bucket(id_col, salt) < F.col("_thr"))
            .drop("_thr"))


def cap_per_group(df: DataFrame, group_col: str, id_col: str, *,
                  max_per_group: int, salt: str = "v1") -> DataFrame:
    """Keep at most ``max_per_group`` rows per group, chosen
    deterministically — the per-domain cap every web-corpus pipeline
    applies ("no more than k pages per site") so one mega-domain cannot
    dominate the mixture.

    Selection order inside a group is (md5 bucket, id): hash-first makes
    the kept subset an unbiased sample of the group rather than its
    first-crawled prefix, and the id tiebreak makes it total — stable
    under reruns, repartitioning, and engines.  One
    ``row_number() OVER (PARTITION BY group)`` window; Spark's
    WindowGroupLimit pushes the k-bound map-side (same plan shape the
    user_paths test pins), so a billion-page domain costs a spillable
    partial top-k, never a full materialized group.
    """
    if max_per_group < 1:
        raise ValueError(f"max_per_group must be >= 1, got {max_per_group}")
    w = (Window.partitionBy(group_col)
         .orderBy(_hash_bucket(id_col, salt), F.col(id_col)))
    return (df.withColumn("_zdb_rn", F.row_number().over(w))
            .where(F.col("_zdb_rn") <= max_per_group)
            .drop("_zdb_rn"))


def global_shuffle(df: DataFrame, id_col: str, *, seed: str = "v1",
                   n_shards: int = 8, pos_col: str = "pos",
                   shard_col: str = "shard") -> DataFrame:
    """Deterministic seeded global shuffle — the export-time
    randomization a training run needs (examples must arrive in a
    random ORDER, not just random shards; data-order curricula are a
    reproducibility hazard unless the shuffle itself is a pure function
    of (seed, id)).

    The shuffled order is ``(bucket, md5(seed:id), id)`` — any
    deterministic pseudo-random total order is a valid shuffle, and
    making the md5 bucket its leading component lets the global
    position be computed WITHOUT a global single-partition window:

    1. one tiny groupBy counts rows per bucket (10k rows), a cumulative
       window over that 10k-row table yields each bucket's global
       offset — broadcast back;
    2. rank WITHIN a bucket is a window partitioned by bucket — 10k
       independent windows, parallel across the cluster.

    ``pos = offset[bucket] + rank - 1`` is the exact global shuffle
    position; ``shard = pos % n_shards`` round-robins the shuffled
    sequence so every shard is itself an unbiased shuffled subsample.
    At 100 TB this is one count-agg + one broadcast + one partitioned
    window — no total sort, no driver state, append-unstable by design
    (a grown corpus re-deals positions; use hash_split for stable
    assignment and this for export ordering).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    keyed = (df.withColumn("_gs_h", h)
               .withColumn("_gs_b", (F.conv(F.substring("_gs_h", 1, 8),
                                            16, 10).cast("long")
                                     % F.lit(_BUCKETS))))
    off_w = (Window.orderBy("_gs_b")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (keyed.groupBy("_gs_b")
               .agg(F.count(F.lit(1)).alias("_gs_n"))
               .select("_gs_b", F.coalesce(F.sum("_gs_n").over(off_w),
                                           F.lit(0)).alias("_gs_off")))
    rank = F.row_number().over(
        Window.partitionBy("_gs_b").orderBy("_gs_h", id_col))
    return (keyed.join(F.broadcast(offsets), "_gs_b")
            .withColumn(pos_col, F.col("_gs_off") + rank - 1)
            .withColumn(shard_col, (F.col(pos_col) % n_shards).cast("int"))
            .drop("_gs_h", "_gs_b", "_gs_off"))


def importance_weights(df: DataFrame, target_pred, *,
                       text_col: str = "text", id_col: str = "doc_id",
                       n_buckets: int = 4096, alpha: float = 0.5,
                       cache_features: bool = False,
                       out_col: str = "log_weight",
                       carry_cols: tuple[str, ...] = (),
                       keep_unscored: bool = True) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public): score each
    document by how much more likely its hashed-bigram features are
    under a TARGET distribution than under the raw corpus, so sampling
    by the weight tilts the mixture toward target-domain-like text
    without training a model.

    Features: word bigrams hashed into ``n_buckets`` md5 buckets (the
    hashing trick — fixed-size sufficient statistics regardless of
    corpus size).  Both distributions come from one pass: the exploded
    bigram stream is counted per bucket with a conditional sum for the
    target subset (``target_pred`` marks target rows — in DSIR terms
    the target corpus; here any predicate over the frame).  The
    per-bucket log-likelihood ratio uses add-``alpha`` smoothing:

        lr(b) = ln((n_t(b)+a)/(T_t+aB)) - ln((n_r(b)+a)/(T_r+aB))

    and a document's ``log_weight`` is the sum of lr over its bigram
    occurrences.  Shape at scale: two passes over the bigram stream
    (count, then score) — each a partial-aggregated groupBy — plus a
    broadcast join of the B-row ratio table (B=4096 regardless of
    corpus size).  Documents with <2 tokens get NULL.

    ``cache_features=True`` persists the exploded (id, bucket) stream
    between the two passes — right when the stream's UPSTREAM is itself
    expensive (a rewrite chain, as in curation_v3) or storage is cheap
    relative to recompute; leave False when two corpus scans beat
    materializing the exploded stream (the usual 100 TB call).  The
    persisted frame rides on the result as ``_zdb_cache_handles``, so
    long-lived sessions release it with ``dedup.release(result)`` after
    materializing (the pair-operator discipline).

    ``keep_unscored=False`` returns ONLY scored documents (those with
    ≥1 bigram) and skips the left-join back to ``df`` entirely — for
    callers that filter the NULL rows out anyway (curation_v3 did
    exactly that: a left join to manufacture NULLs, an inner join to
    re-attach metadata, then ``isNotNull``).  ``carry_cols`` rides
    row-constant metadata columns (e.g. source) through the feature
    stream and the scoring groupBy, so such callers need NO join at
    all; requires ``keep_unscored=False`` (the left-join wrapper has
    nowhere to take the metadata from for unscored rows).
    """
    from .dedup import let
    from .text import _ngram_col, tokenize

    if carry_cols and keep_unscored:
        raise ValueError("carry_cols requires keep_unscored=False")
    toks = tokenize(text_col)
    grams = let(toks, lambda t: _ngram_col(t, 2))
    ex = df.select(F.col(id_col),
                   *[F.col(c) for c in carry_cols],
                   target_pred.cast("long").alias("_is_t"),
                   F.explode(grams).alias("gram"))
    ex = ex.withColumn("bkt", F.conv(F.substring(F.md5("gram"), 1, 8),
                                     16, 10).cast("long")
                              % F.lit(n_buckets))
    if cache_features:
        ex = ex.persist()
    stats = ex.groupBy("bkt").agg(F.count(F.lit(1)).alias("n_raw"),
                                  F.sum("_is_t").alias("n_t"))
    totals = stats.agg(F.sum("n_raw").alias("t_raw"),
                       F.sum("n_t").alias("t_t"))
    ab = F.lit(alpha * n_buckets)
    lr = (F.log((F.col("n_t") + F.lit(alpha)) / (F.col("t_t") + ab))
          - F.log((F.col("n_raw") + F.lit(alpha)) / (F.col("t_raw") + ab)))
    lr_tbl = (stats.crossJoin(F.broadcast(totals))
              .select("bkt", lr.alias("_lr")))
    scored = (ex.join(F.broadcast(lr_tbl), "bkt")
              .groupBy(id_col, *carry_cols)
              .agg(F.count(F.lit(1)).alias("n_grams"),
                   round0(F.sum("_lr"), 4).alias(out_col)))
    out = scored if not keep_unscored \
        else df.select(id_col).join(scored, id_col, "left")
    if cache_features:
        out._zdb_cache_handles = [ex]
    return out


# ---------------------------------------------------------------------- #
# URL canonicalization + dedup (crawl-frontier hygiene, zero-UDF)         #
# ---------------------------------------------------------------------- #
# The same page arrives from a crawl under many spellings: scheme/host
# case, default ports, fragments, tracking parameters, unordered query
# strings.  Exact text dedup misses these until AFTER a fetch; URL
# canonicalization dedups the FRONTIER — before the bytes are ever
# fetched — which at crawl scale is the cheapest dedup there is.
# Everything below is pure-Catalyst string algebra (regexp/split/
# filter/sort_array), so it rides whole-stage codegen and replays
# exactly in the DuckDB oracle.

# Pinned tracking-parameter set (the industry-standard strip list;
# extending it is a semantic change to canonical identity, so version
# any extension through a new operator argument, not an edit).  Bare
# `ref` is deliberately NOT stripped: it is functional on major hosts
# (it selects content, e.g. a branch name) — merging across it would
# silently drop distinct pages from a frontier.
_URL_TRACKING = ("utm_[a-z]+|gclid|fbclid|msclkid|mc_eid|igshid|"
                 "ref_src|spm")
_URL_TRACKING_RE = f"^({_URL_TRACKING})="


def canonicalize_url(url) -> F.Column:
    """Canonical form of a URL column (pure Catalyst, no UDF):

    - scheme and host lowercase; default ports dropped (``:80`` for
      http, ``:443`` for https);
    - fragment dropped;
    - empty path becomes ``/``;
    - query parameters: tracking params (pinned list above) removed,
      the rest SORTED for order-independent identity; an emptied query
      loses its ``?``.

    A string without ``://`` is not a fetchable URL — it passes
    through as ``lower(trim(url))`` (an opaque key is still a
    dedupable key; guessing a scheme would manufacture identity)."""
    u = F.trim(url if isinstance(url, F.Column) else F.col(url))
    # fragment is dropped FIRST: a '?' inside the fragment must never
    # be read as a query delimiter ('https://a.com/p#sec?b=1' has no
    # query at all)
    uf = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(F.regexp_extract(uf,
                                      r"^([A-Za-z][A-Za-z0-9+.-]*)://",
                                      1))
    host = F.lower(F.regexp_extract(uf, r"^[A-Za-z][A-Za-z0-9+.-]*://"
                                        r"([^/?#]*)", 1))
    host = (F.when(scheme == "http",
                   F.regexp_replace(host, ":80$", ""))
            .when(scheme == "https",
                  F.regexp_replace(host, ":443$", ""))
            .otherwise(host))
    path = F.regexp_extract(uf, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
                                r"([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(uf, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_URL_TRACKING_RE))
    qjoin = F.array_join(F.sort_array(kept), "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qjoin == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), qjoin)))
    return F.when(scheme == "", F.lower(u)).otherwise(canon)


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by CANONICAL URL: adds ``canonical_url``, elects the
    minimum ``id_col`` per canonical group as ``canonical_id``, and
    flags ``is_canonical`` — the dedup.exact_dedup election shape
    (groupBy-min, no window, no skew cliff: group size is bounded by
    spelling variants of one page, not corpus size)."""
    canon = df.withColumn("canonical_url", canonicalize_url(url_col))
    winners = (canon.groupBy("canonical_url")
               .agg(F.min(id_col).alias("canonical_id")))
    # null-safe join key: a NULL url is still a row — an inner
    # equi-join would silently drop it (null != null in SQL), so
    # NULL-url rows join their own NULL group and each is elected
    # against the other NULL-url rows like any spelling group
    joined = canon.join(
        winners,
        canon["canonical_url"].eqNullSafe(winners["canonical_url"]))
    return (joined.drop(winners["canonical_url"])
            .withColumn("is_canonical",
                        F.col(id_col) == F.col("canonical_id")))
