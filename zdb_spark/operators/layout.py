"""Z-order (Morton-curve) clustered layout — multi-dimensional data
skipping for the 100 TB scan problem the reference's single-dimension
partition layout cannot solve.

The reference clusters on TIME alone (partition dirs + in-partition ts
order, ``reference/src/table/`` write path): a ``ts BETWEEN``
predicate prunes, but any second predicate (symbol, price band, user)
scans every surviving file end-to-end.  Z-ordering interleaves the
bits of several normalized columns into one integer sort key, so rows
near each other on the curve are near each other in EVERY keyed
dimension at once — each parquet file/row-group then covers a small
rectangle of the (ts × value × ...) space, and the engine's ordinary
min/max statistics prune MULTI-dimensional predicates without any new
reader machinery (the technique behind Delta/Iceberg OPTIMIZE ZORDER;
Morton 1966).

Everything stays engine-native: the key is pure integer bit algebra
(codegen-friendly Catalyst expressions, no UDF), the write is
``repartitionByRange(key) + sortWithinPartitions(key)`` (one range
shuffle — the same cost as the time-sorted write it replaces), and
reads are plain ``spark.read.parquet`` + filters: pushdown and
row-group skipping come from Parquet stats as always.  The key is
LAYOUT ONLY — it never appears in results, so the float scaling into
grid cells carries no cross-engine determinism burden.

Scale notes:
- ``bits`` controls curve resolution: m columns × b bits must fit a
  long (m*b <= 62); 12 bits/dim ≈ 4096 cells/dim is plenty — file
  counts, not cell counts, bound the achievable pruning.
- per-column lo/hi come from one cheap aggregate (or caller-supplied
  bounds for append pipelines — FIXED bounds keep epochs comparable
  so new files interleave into the same curve).
- skew: range partitioning equalizes ROWS per file regardless of
  curve-space density, so a hot region just maps to more files, each
  still covering a small rectangle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zorder_key", "scale_to_grid", "write_zordered",
           "file_span_stats"]


def scale_to_grid(col: Column, lo: float, hi: float,
                  bits: int) -> Column:
    """Map a numeric column into integer grid cells [0, 2^bits): linear
    min/max scaling, clamped (values at/above ``hi`` take the top
    cell; degenerate lo==hi collapses to cell 0).  NULLs -> cell 0 (a
    NULL key row still needs a place on the curve)."""
    cells = 1 << bits
    if lo is None or hi is None or hi <= lo:
        # all-NULL column (no bounds) or degenerate range: one cell
        return F.lit(0).cast("long")
    scaled = ((col.cast("double") - F.lit(float(lo)))
              / F.lit(float(hi - lo)) * F.lit(float(cells)))
    cell = F.least(F.lit(cells - 1),
                   F.greatest(F.lit(0), F.floor(scaled))).cast("long")
    return F.coalesce(cell, F.lit(0).cast("long"))


def zorder_key(grid_cols: list[Column], bits: int = 12) -> Column:
    """Interleave the low ``bits`` bits of each grid column into one
    Morton key: bit j of column c lands at position j*m + c (m = number
    of columns).  Pure integer Catalyst algebra — 2*m*bits shift/and/or
    terms, fully inside whole-stage codegen."""
    m = len(grid_cols)
    if m < 1:
        raise ValueError("zorder_key needs at least one column")
    if m * bits > 62:
        raise ValueError(f"{m} cols x {bits} bits exceeds a long")
    key = F.lit(0).cast("long")
    for c, col in enumerate(grid_cols):
        v = col.cast("long")
        for j in range(bits):
            bit = F.shiftright(v, j).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, j * m + c))
    return key


def write_zordered(df: DataFrame, path: str, cols: list[str], *,
                   bits: int = 12, n_files: int | None = None,
                   bounds: dict[str, tuple[float, float]] | None = None
                   ) -> dict[str, tuple[float, float]]:
    """Write ``df`` as parquet clustered on the Z-order curve of
    ``cols``: one range shuffle on the Morton key, in-file sort, key
    dropped before write.  ``bounds`` (col -> (lo, hi)) pins the grid
    for append pipelines; omitted bounds are computed with one
    aggregate.  Returns the bounds used (persist them next to the data
    so later epochs share the curve).  Timestamp columns are keyed by
    their epoch value via an internal cast."""
    aggs, need = [], []
    bounds = dict(bounds or {})
    for c in cols:
        if c not in bounds:
            need.append(c)
            num = F.col(c).cast("double")
            aggs += [F.min(num).alias(f"_lo_{c}"),
                     F.max(num).alias(f"_hi_{c}")]
    if need:
        row = df.agg(*aggs).first()
        for c in need:
            bounds[c] = (row[f"_lo_{c}"], row[f"_hi_{c}"])
    grid = [scale_to_grid(F.col(c), bounds[c][0], bounds[c][1], bits)
            for c in cols]
    keyed = df.withColumn("_zkey", zorder_key(grid, bits))
    n = n_files or keyed.sparkSession.conf.get(
        "spark.sql.shuffle.partitions")
    (keyed.repartitionByRange(int(n), "_zkey")
     .sortWithinPartitions("_zkey")
     .drop("_zkey")
     .write.mode("overwrite").parquet(path))
    return bounds


def file_span_stats(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file (min, max, normalized span) of each clustered column —
    the direct measurement of data-skipping quality: a file's span in a
    dimension is the fraction of that dimension's global range a
    predicate must assume the file covers.  Random or single-dimension
    layouts give span ≈ 1 in the other dimensions; a Z-ordered layout keeps
    every dimension's MEAN span small, which is exactly what lets
    Parquet min/max stats prune multi-dimensional predicates."""
    df = spark.read.parquet(path).withColumn(
        "_file", F.input_file_name())
    aggs = []
    for c in cols:
        num = F.col(c).cast("double")
        aggs += [F.min(num).alias(f"lo_{c}"), F.max(num).alias(f"hi_{c}")]
    per_file = df.groupBy("_file").agg(*aggs)
    glob = df.agg(*[a for c in cols for a in
                    (F.min(F.col(c).cast("double")).alias(f"glo_{c}"),
                     F.max(F.col(c).cast("double")).alias(f"ghi_{c}"))])
    out = per_file.crossJoin(F.broadcast(glob))
    for c in cols:
        width = F.col(f"ghi_{c}") - F.col(f"glo_{c}")
        out = out.withColumn(
            f"span_{c}",
            F.when(width > 0,
                   (F.col(f"hi_{c}") - F.col(f"lo_{c}")) / width)
            .otherwise(F.lit(0.0)))
    return out
