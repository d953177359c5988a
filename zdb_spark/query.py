"""The ``/q`` compatibility surface: arbitrary-code queries over projected
column vectors — the reference's embedded-Julia engine re-expressed as
pandas-over-Arrow (SURVEY.md §2.5).

Reference contract (/root/reference/src/server/query.rs:147-232):
1. the query defines a function named ``scan``;
2. its parameter NAMES select the columns (projection pushdown derived
   from the UDF signature, :166-215);
3. ``scan`` is invoked once per partition, sequentially in time order,
   over zero-copy column vectors; cross-partition state lives in globals;
4. the last call's return value is the result.

Spark-native re-expression:
- parameter-name introspection via ``inspect.signature`` → ``table.scan``
  projection (same pushdown, now feeding Catalyst);
- per-"partition" execution = ``mapInPandas`` over Arrow batches (the
  batch is the analogue of zdb's per-partition column slice) — runs
  PARALLEL on executors; the user function returns a *partial* state and
  a ``combine`` reduces partials driver-side.  This is the honest
  distributed contract (partial + final aggregation) — zdb's
  sequential-fold-with-globals does not parallelize.
- ``ordered=True`` falls back to exact zdb emulation: partitions visited
  sequentially in time order on the driver (collect per time-partition),
  so non-commutative folds and global-variable styles work unchanged.

For everything else (joins, windows, sorts, set ops — which zdb users
reached by writing Julia) the engine exposes the full DataFrame/SQL
surface: ``Engine.sql`` registers tables as temp views and hands the query
to Catalyst (SURVEY.md §2.7).
"""

from __future__ import annotations

import inspect
import pickle
from functools import reduce
from typing import Any, Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from .functions.scalar import to_nanos
from .schema import ColumnType
from .table import Table

__all__ = ["q", "Engine", "QueryError"]


class QueryError(ValueError):
    """/q validation failure carrying the reference's exact message shape
    (/root/reference/src/server/query.rs:166-214); the HTTP layer returns
    it verbatim as a 400 body."""


# The reference validates each scan parameter against the column's
# physical type and names the expected Julia vector type in the error
# (query.rs:28-44).  Same table here — symbols differ because this engine
# decodes them to native strings (SURVEY §2: symbol decode is native)
# rather than exposing dictionary codes.
_JULIA_TYPE = {
    ColumnType.I8: "Int8", ColumnType.I16: "Int16",
    ColumnType.I32: "Int32", ColumnType.I64: "Int64",
    ColumnType.U8: "UInt8", ColumnType.U16: "UInt16",
    ColumnType.U32: "UInt32", ColumnType.U64: "UInt64",
    ColumnType.F32: "Float32", ColumnType.F64: "Float64",
    ColumnType.TIMESTAMP: "Int64",
    ColumnType.SYMBOL8: "String", ColumnType.SYMBOL16: "String",
    ColumnType.SYMBOL32: "String",
}

# Annotation spellings accepted per expected type: the zdb type name, the
# numpy/pandas dtype name, the Python builtin, the Julia form itself, AND
# the dtype Spark actually delivers (unsigned types widen — u8 arrives as
# an int16 Series, etc.), so annotating the truthful runtime type always
# validates.
_ACCEPTED = {
    "Int8": {"i8", "int8"}, "Int16": {"i16", "int16"},
    "Int32": {"i32", "int32"}, "Int64": {"i64", "int64", "int",
                                         "timestamp"},
    "UInt8": {"u8", "uint8", "int16"}, "UInt16": {"u16", "uint16", "int32"},
    "UInt32": {"u32", "uint32", "int64"},
    "UInt64": {"u64", "uint64", "int64", "decimal"},
    "Float32": {"f32", "float32"}, "Float64": {"f64", "float64", "float"},
    "String": {"str", "string", "symbol", "object"},
}

# The runtime container is always a pandas Series — annotating it says
# nothing about the element type, so it validates for any column.
_CONTAINER_ANNOTATIONS = {"Series", "pd.Series", "pandas.Series", "Any"}


def _ann_str(a) -> str:
    if isinstance(a, str):
        return a
    return getattr(a, "__name__", str(a))


def _projection_for(fn: Callable, table: Table) -> list[str]:
    """Parameter names → column projection; parameter type annotations
    (when present) are validated against the column's declared type with
    the reference's error texts (/root/reference/src/server/query.rs:
    28-44,166-214).  Validation happens BEFORE any job launches, so a
    wrong-dtype scan is a clean 400, not an opaque executor-side pandas
    error."""
    sig = inspect.signature(fn).parameters
    if not sig:
        raise QueryError("scan function must take at least one column argument")
    for name, prm in sig.items():
        try:
            col = table.schema.column(name)
        except KeyError:
            raise QueryError(f"column {name} does not exist on table "
                             f"{table.schema.name}") from None
        if prm.annotation is not inspect.Parameter.empty:
            jt = _JULIA_TYPE[col.ctype]
            ok = ({jt, jt.lower(), f"Vector{{{jt}}}"}
                  | _ACCEPTED[jt] | _CONTAINER_ANNOTATIONS)
            if _ann_str(prm.annotation) not in ok:
                raise QueryError(f"expected parameter {name} to be of "
                                 f"type Vector{{{jt}}}")
    return list(sig)


def q(table: Table, scan: Callable, from_ts, to_ts,
      combine: Callable[[Any, Any], Any] | None = None,
      ordered: bool = False) -> Any:
    """Run ``scan(col_a, col_b, ...)`` over the time range, columns chosen
    by the function's parameter names (pandas Series args).

    - default: parallel partial-fold; ``combine`` merges the per-batch
      partials (defaults to ``operator.add``-style reduction via ``+`` when
      possible, else returns the list of partials).
    - ``ordered=True``: sequential time-ordered fold (exact reference
      semantics, /root/reference/src/server/query.rs:218-226); ``scan`` may
      keep state in closures/globals; the LAST call's return value is the
      result.
    """
    lo, hi = to_nanos(from_ts), to_nanos(to_ts)
    cols = _projection_for(scan, table)

    if ordered:
        # the sequential fold needs ts to derive/visit time partitions even
        # when the scan function doesn't reference it
        ts = table.schema.ts_col
        proj = cols if ts in cols else [ts, *cols]
        return _run_ordered(table, table.scan(lo, hi, proj), scan, cols)

    df = table.scan(lo, hi, cols)

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = []
        for pdf in batches:
            res = scan(*[pdf[c] for c in cols])
            out.append(pickle.dumps(res))
        if out:
            yield pd.DataFrame({"partial": out})

    partials_df = df.mapInPandas(mapper, "partial binary")
    partials = [pickle.loads(r["partial"]) for r in partials_df.collect()]
    if not partials:
        return None
    if combine is None:
        try:
            return reduce(lambda a, b: a + b, partials)
        except TypeError:
            return partials
    return reduce(combine, partials)


def _run_ordered(table: Table, df: DataFrame, scan: Callable,
                 cols: list[str]) -> Any:
    """Sequential fold: ``scan`` is called once per TIME partition, in
    ascending time order, exactly like the reference's per-partition loop
    (/root/reference/src/server/query.rs:218-226).  ``scan`` may carry
    state across calls in globals/closures; the last call's return value
    is the result.  Driver-side by design — exact-emulation mode trades
    scalability for zdb's sequential contract."""
    ts = table.schema.ts_col
    # Re-derive the time-partition key on the (already filtered/projected)
    # frame, then visit each partition sequentially in time order.
    # PERSIST across the loop: the dt filter is on a DERIVED expression
    # (the scan projected the storage partition column away), so Catalyst
    # cannot prune directories per iteration — without the cache, a year
    # of DAY partitions would re-read every file ~366 times (distinct +
    # one pass per dt); with it the source is read once.
    part_df = table._with_partition_col(df).persist()
    try:
        dt_values = sorted(r["dt"] for r in
                           part_df.select("dt").distinct().collect())
        result = None
        for dt_val in dt_values:
            pdf = (part_df.where(part_df["dt"] == dt_val)
                   .sort(ts).select(*cols).toPandas())
            if len(pdf) == 0:
                continue
            result = scan(*[pdf[c] for c in cols])
        return result
    finally:
        part_df.unpersist()


class Engine:
    """Session-level facade: tables + SQL + raw DataFrames.

    This is the strict-superset surface SURVEY.md §2.7 calls for — the
    operators zdb delegated to Julia (joins, sorts, windows, set ops) come
    from Catalyst via ``sql``/``df``.
    """

    def __init__(self, spark: SparkSession, home: str | None = None) -> None:
        self.spark = spark
        self.home = home

    def table(self, name: str) -> Table:
        return Table.open(self.spark, name, self.home)

    def register(self, name: str) -> DataFrame:
        df = self.table(name).df()
        df.createOrReplaceTempView(name)
        return df

    def register_parquet(self, name: str, path: str) -> DataFrame:
        df = self.spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        return df

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)
