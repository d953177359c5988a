"""Skew handling for hot keys: salted two-phase aggregation.

AQE's skew-join splitting (enabled in session defaults) handles skewed
JOINS at runtime, but a skewed GROUP BY with an algebraic aggregate is
better served by salting: shard each hot key across ``n_salts`` reducers
with a synthetic salt column, partially aggregate per (key, salt), then
combine the partials in a second (tiny) aggregation.  A power-law corpus
at 100 TB routinely has keys holding 1-10% of all rows — unsalted, one
reducer processes that key's entire volume while the rest of the cluster
idles; salted, the hot key's work spreads evenly and the second phase
touches ``n_salts`` rows per key.

Only ALGEBRAIC aggregates decompose like this (sum, count, min, max, and
anything built from them — avg = sum/count); holistic aggregates
(exact percentiles, collect_list) need a different strategy (sketches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["salted_agg"]

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(df: DataFrame, keys: list[str],
               aggs: dict[str, tuple[str, str]],
               n_salts: int = 16) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column name → (input column, fn) with fn in
    {sum, count, min, max}.  avg is expressed by requesting sum+count and
    dividing afterwards.

    Phase 1 groups by (keys..., salt) — the wide shuffle, now even —
    and phase 2 merges the ≤ ``n_salts`` partials per key: sums add,
    counts add, min/max re-minimize.  Results are exactly equal to the
    unsalted aggregation (algebraic decomposition), only the shuffle
    distribution changes.
    """
    for fn_name in (fn for _, fn in aggs.values()):
        if fn_name not in _MERGE:
            raise ValueError(f"non-algebraic aggregate {fn_name!r}; "
                             "use a sketch instead")

    salt = (F.rand(seed=42) * n_salts).cast("int").alias("_salt")

    def phase1(out: str, col: str, fn: str) -> Column:
        f = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[fn]
        return f(col).alias(out)

    partial = (df.withColumn("_salt", salt)
                 .groupBy(*keys, "_salt")
                 .agg(*[phase1(out, col, fn)
                        for out, (col, fn) in aggs.items()]))
    return (partial.groupBy(*keys)
            .agg(*[_MERGE[fn](out).alias(out)
                   for out, (_, fn) in aggs.items()]))
