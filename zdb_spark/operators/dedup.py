"""Deduplication operators for training-data pipelines at 100 TB scale.

Four families, cheapest first:

1. ``exact_dedup`` — hash-groupBy on (normalized) content.  One shuffle on
   a 128-bit digest; the canonical first pass at any scale.
2. ``minhash_lsh_pairs`` — MinHash signatures + banded LSH.  All hashing is
   JVM-side (``xxhash64`` with per-permutation seeds over character
   shingles); candidate generation is an equi-join on (band, band_hash) —
   i.e. a shuffle on small keys, never an all-pairs product; candidates are
   verified with exact shingle-set Jaccard.
3. ``simhash`` / ``simhash_pairs`` — 64-bit SimHash per doc; near-dup
   candidates via the pigeonhole band trick (hamming ≤ d pairs must share
   one of d+1 equal chunks), verified with ``bit_count(xor)``.
4. ``embedding_dedup_pairs`` — cosine near-dup over an embedding column via
   random-hyperplane bucketing + exact verify (delegates to
   operators.similarity).

Scale notes: every operator is expressed as DataFrame ops (shuffle-by-key,
no driver collects, no Python in the hot path).  The LSH joins are
self-equi-joins whose key cardinality grows with corpus size, so AQE
handles skew; extremely hot buckets (boilerplate docs) can be frequency-
capped upstream with one groupBy-count filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["normalize_text", "exact_dedup", "shingle_col",
           "minhash_signature", "minhash_lsh_pairs", "simhash",
           "simhash_pairs", "ngram_jaccard_pairs"]


def normalize_text(text: Column | str) -> Column:
    """lower + whitespace-collapse + trim; the standard exact-dedup key."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                normalized: bool = True) -> DataFrame:
    """Exact (optionally normalization-invariant) duplicate groups.

    Returns one row per distinct content hash: ``content_hash``,
    ``keep_id`` (min id — the canonical survivor), ``dup_count``.
    Single shuffle on the digest; at 100 TB the digest groupBy is the
    only wide stage and partial aggregation halves the shuffle.
    """
    key = normalize_text(text_col) if normalized else F.col(text_col)
    return (df.groupBy(F.md5(key.cast("binary")).alias("content_hash"))
              .agg(F.min(id_col).alias("keep_id"),
                   F.count(F.lit(1)).alias("dup_count")))


def shingle_col(text: Column | str, k: int = 5) -> Column:
    """Distinct k-char shingles of normalized text (JVM-side)."""
    c = normalize_text(text)
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(c, i, F.lit(k))))


def minhash_signature(df: DataFrame, text_col: str = "text",
                      num_hashes: int = 64, k: int = 5,
                      out_col: str = "minhash") -> DataFrame:
    """num_hashes-wide MinHash signature over k-char shingles.

    Permutation *i* is ``xxhash64(shingle, i)`` (seeded 64-bit hash);
    signature element *i* is the min over the doc's shingles.  All inside
    codegen — no Python per row.
    """
    sh = shingle_col(text_col, k)

    # NB: the lambda must take exactly ONE positional arg — pyspark treats
    # a second parameter (even defaulted) as the (element, index) lambda
    # variant and binds it to the array-index Column.
    def perm_min(i: int):
        return F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(i))))

    sig = F.array(*[perm_min(i) for i in range(num_hashes)])
    return df.withColumn(out_col, sig)


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 64,
                      bands: int = 16, k: int = 5,
                      threshold: float = 0.5) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH + exact-Jaccard verify.

    rows out: (id_a, id_b, est_jaccard, jaccard) with id_a < id_b and
    exact shingle Jaccard >= threshold.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    # Materialize signatures+shingles ONCE: the candidate self-join would
    # otherwise duplicate the (large) minhash expression tree on both
    # sides of the join and recompute it per band row.
    base = (minhash_signature(df, text_col, num_hashes, k)
            .withColumn("_sh", shingle_col(text_col, k))
            .select(F.col(id_col).alias("_id"), "minhash", "_sh")
            .cache())

    # Slim (id, band, band_hash) rows — 16 small rows per doc, no arrays.
    banded = base.select(
        "_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.xxhash64(F.slice("minhash", b * r + 1, r)).alias("bh"))
            for b in range(bands)
        ])).alias("bb")).select("_id", "bb.band", "bb.bh")

    a = banded.select(F.col("_id").alias("id_a"), "band", "bh")
    b = banded.select(F.col("_id").alias("id_b"), "band", "bh")
    cand = (a.join(b, ["band", "bh"]).where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").dropDuplicates())

    # Fetch per-doc data once per unique candidate pair.
    pa = base.select(F.col("_id").alias("id_a"), F.col("minhash").alias("sig_a"),
                     F.col("_sh").alias("sh_a"))
    pb = base.select(F.col("_id").alias("id_b"), F.col("minhash").alias("sig_b"),
                     F.col("_sh").alias("sh_b"))
    pairs = cand.join(pa, "id_a").join(pb, "id_b")

    est = (F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                      lambda x, y: x == y),
                           lambda m: m))
           .cast("double") / F.lit(num_hashes))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (pairs.withColumn("est_jaccard", F.round(est, 6))
                 .withColumn("jaccard", F.round(inter / union, 6))
                 .where(F.col("jaccard") >= threshold)
                 .select("id_a", "id_b", "est_jaccard", "jaccard"))


def simhash(df: DataFrame, text_col: str = "text",
            out_col: str = "simhash") -> DataFrame:
    """64-bit SimHash over whitespace tokens.

    Bit *i* of the fingerprint is the sign of Σ_tokens ±1 where the sign
    is bit *i* of ``xxhash64(token)``.  Built as 64 JVM aggregate
    expressions over the token array — wide plan, zero Python.
    """
    toks = F.split(normalize_text(text_col), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_mask(i: int):
        # bit 63 must be the long's sign bit, not a Python bignum
        return F.lit(1 << i) if i < 63 else F.lit(-(1 << 63))

    def bit_vote(i: int):
        mask = bit_mask(i)
        return F.aggregate(
            hashes, F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, F.lit(1))
                                  .otherwise(F.lit(-1)))

    fp = F.lit(0).cast("long")
    for i in range(64):
        fp = fp + F.when(bit_vote(i) > 0, bit_mask(i)).otherwise(F.lit(0))
    return df.withColumn(out_col, fp)


def simhash_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole: split 64 bits into (max_hamming+1) chunks; any pair within
    distance d shares at least one identical chunk → equi-join per chunk,
    exact ``bit_count(a xor b)`` verify.
    """
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    # cache: the 64-bit-vote expression tree is expensive; the self-join
    # below would otherwise evaluate it twice per side.
    sh = (simhash(df, text_col).select(F.col(id_col).alias("_id"), "simhash")
          .cache())
    chunks = sh.select(
        "_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftrightunsigned("simhash", c * width)
                      .bitwiseAND(F.lit((1 << width) - 1)).alias("cv"))
            for c in range(n_chunks)
        ])).alias("ck"))
    a = chunks.select(F.col("_id").alias("id_a"), F.col("simhash").alias("h_a"), "ck")
    b = chunks.select(F.col("_id").alias("id_b"), F.col("simhash").alias("h_b"), "ck")
    return (a.join(b, ["ck"]).where(F.col("id_a") < F.col("id_b"))
             .dropDuplicates(["id_a", "id_b"])
             .withColumn("hamming", F.bit_count(
                 F.col("h_a").bitwiseXOR(F.col("h_b"))))
             .where(F.col("hamming") <= max_hamming)
             .select("id_a", "id_b", "hamming"))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 5,
                        threshold: float = 0.8,
                        max_shingle_freq: int = 1000) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted shingle index.

    explode(shingles) → frequency-cap boilerplate shingles
    (``max_shingle_freq``) → self-join on shingle → count shared →
    Jaccard from per-doc shingle counts.  The frequency cap is what keeps
    the join product bounded at corpus scale (a stopword-like shingle
    otherwise pairs everything with everything).
    """
    sh = (df.select(F.col(id_col).alias("_id"),
                    shingle_col(text_col, k).alias("_sh"))
            .withColumn("n_sh", F.size("_sh")))
    inv = sh.select("_id", "n_sh", F.explode("_sh").alias("g"))
    freq = inv.groupBy("g").agg(F.count(F.lit(1)).alias("df_"))
    inv = (inv.join(freq.where(F.col("df_") <= max_shingle_freq), "g")
              .drop("df_"))
    a = inv.select(F.col("_id").alias("id_a"), F.col("n_sh").alias("na"), "g")
    b = inv.select(F.col("_id").alias("id_b"), F.col("n_sh").alias("nb"), "g")
    shared = (a.join(b, ["g"]).where(F.col("id_a") < F.col("id_b"))
               .groupBy("id_a", "id_b", "na", "nb")
               .agg(F.count(F.lit(1)).alias("shared")))
    jac = (F.col("shared").cast("double")
           / (F.col("na") + F.col("nb") - F.col("shared")))
    return (shared.withColumn("jaccard", F.round(jac, 6))
                  .where(F.col("jaccard") >= threshold)
                  .select("id_a", "id_b", "jaccard"))
