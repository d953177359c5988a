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

__all__ = ["hash_split", "pack_sequences"]

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
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


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
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(tokens_col).over(w)
    return (df.withColumn("shard", shard)
            .withColumn("bin",
                        F.floor((cum - F.col(tokens_col))
                                / F.lit(max_tokens)).cast("long")))
