"""OHLCV: the reference's one fixed aggregation endpoint, plus the
resampling operator it left as a TODO.

Reference semantics (SURVEY.md §2.3, /root/reference/src/server/ohlcv.rs:47-137):
``GET /ohlcv/{table}/{from}/{to}?symbols=A,B`` scans the fixed projection
``ts,sym,open,high,low,close,volume`` over the time range, filters to the
requested symbol set (empty set = all), groups rows per symbol into parallel
t/o/h/l/c/v arrays, tracks global min/max ts, and returns
``{results: {SYM: {t,o,h,l,c,v}}, min_date, max_date}``.

Notably the reference does NOT resample — it returns stored bars as-is; the
intended-but-unimplemented ``TODO: duration like 5Minutes``
(/root/reference/src/server/ohlcv.rs:56) is implemented here as
``resample``: tumbling time-bucket OHLCV via ``min_by``/``max_by`` (JVM-side,
one shuffle on (bucket, symbol), map-side partial aggregation for free).

Scale notes:
- The long-form DataFrame (one row per (sym, bar)) is the distributed
  product; the nested-arrays JSON shape is assembled only at the API
  boundary (driver-side) because it is per-symbol collect — fine for an
  HTTP chart endpoint, wrong as a distributed operator.
- ``first/last within bucket`` use ``min_by(open, ts)`` / ``max_by(close,
  ts)`` rather than window functions: single-pass aggregation instead of a
  sort per partition, and deterministic because (ts) is unique per (sym,
  bucket) in tick data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .functions.scalar import nanos_to_ts, to_nanos
from .table import Table

__all__ = ["ohlcv_frame", "ohlcv", "resample", "parse_every",
           "duration_of_nanos", "threshold_bars"]

# URL-friendly duration aliases for the /ohlcv `every` parameter —
# accepts the reference TODO's "5Minutes" shape, compact "5m"/"1h", and
# full Spark duration words.
_EVERY_UNITS = {
    "ms": "milliseconds", "millisecond": "milliseconds",
    "milliseconds": "milliseconds",
    "s": "seconds", "sec": "seconds", "second": "seconds",
    "seconds": "seconds",
    "m": "minutes", "min": "minutes", "minute": "minutes",
    "minutes": "minutes",
    "h": "hours", "hour": "hours", "hours": "hours",
    "d": "days", "day": "days", "days": "days",
}


def parse_every(every: str) -> str:
    """Normalize a user/URL duration ("5m", "1h", "5Minutes",
    "30 seconds") to a Spark window duration string."""
    import re

    m = re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]+)\s*", every or "")
    if not m or m.group(2).lower() not in _EVERY_UNITS \
            or int(m.group(1)) == 0:
        raise ValueError(
            f"cannot parse duration {every!r} "
            "(want e.g. '5m', '1h', '30s', '5 minutes')")
    return f"{int(m.group(1))} {_EVERY_UNITS[m.group(2).lower()]}"

OHLCV_COLS = ("open", "high", "low", "close", "volume")


def ohlcv_frame(table: Table, from_ts, to_ts, symbols: list[str] | None = None,
                symbol_col: str = "sym") -> DataFrame:
    """Distributed long-form OHLCV: stored bars in [from_ts, to_ts] for the
    requested symbols (None/empty = all), one row per bar.

    Mirrors A3-A7 of the endpoint (scan → isin filter → upcast volume),
    leaving grouping to the caller/serializer.
    """
    lo, hi = to_nanos(from_ts), to_nanos(to_ts)
    if lo > hi:  # reference swaps reversed ranges (ohlcv.rs:64-66)
        lo, hi = hi, lo
    cols = [table.schema.ts_col, symbol_col, *OHLCV_COLS]
    df = table.scan(lo, hi, cols)
    if symbols:
        df = df.where(F.col(symbol_col).isin(list(symbols)))
    return df.withColumn("volume", F.col("volume").cast("long"))


def ohlcv(table: Table, from_ts, to_ts, symbols: list[str] | None = None,
          symbol_col: str = "sym", every: str | None = None) -> dict:
    """API-shape result: ``{results: {SYM: {t,o,h,l,c,v}}, min_date,
    max_date}`` (/root/reference/src/server/ohlcv.rs:30-45).

    ``every`` resamples the stored bars to coarser buckets first — the
    reference's unimplemented ``TODO: duration like 5Minutes``
    (/root/reference/src/server/ohlcv.rs:56), accepted in that spelling
    plus "5m"/"1h"/Spark duration words; ``t`` then holds bucket-start
    nanos.  Grouping into per-symbol parallel arrays happens in ONE
    aggregation (sort_array over collected structs), so Spark still does
    the heavy lifting; only the final per-symbol arrays hit the driver.

    BOUNDED DRIVER MATERIALIZATION: this is the API endpoint — the
    return value is a JSON-shaped dict, so every requested bar crosses
    the driver (``collect``), like every other endpoint serializer.
    The bound is bars-in-range × symbols-requested, which the CALLER
    controls via [from_ts, to_ts), ``symbols``, and ``every``; a
    chart request is a few thousand bars.  For unbounded/analytical
    reads use ``ohlcv_frame`` — the same scan + filter as a lazy
    DataFrame that never touches the driver.
    """
    ts = table.schema.ts_col
    df = ohlcv_frame(table, from_ts, to_ts, symbols, symbol_col)
    if every is not None:
        from .functions.scalar import ts_to_nanos

        df = (resample(df, parse_every(every), ts_col=ts,
                       symbol_col=symbol_col)
              .select(ts_to_nanos(F.col("bucket_start")).alias(ts),
                      F.col(symbol_col), *OHLCV_COLS)
              .withColumn("volume", F.col("volume").cast("long")))
    grouped = (df.groupBy(symbol_col)
               .agg(F.sort_array(F.collect_list(F.struct(
                   ts, *OHLCV_COLS))).alias("bars"),
                   F.min(ts).alias("_lo"), F.max(ts).alias("_hi")))
    rows = grouped.collect()
    results: dict[str, dict[str, list]] = {}
    lo_all, hi_all = None, None
    for r in rows:
        bars = r["bars"]
        results[r[symbol_col]] = {
            "t": [b[ts] for b in bars],
            "o": [b["open"] for b in bars],
            "h": [b["high"] for b in bars],
            "l": [b["low"] for b in bars],
            "c": [b["close"] for b in bars],
            "v": [b["volume"] for b in bars],
        }
        lo_all = r["_lo"] if lo_all is None else min(lo_all, r["_lo"])
        hi_all = r["_hi"] if hi_all is None else max(hi_all, r["_hi"])
    # min_date/max_date are i64 epoch nanos, matching the reference's
    # OHLCVsResponse struct exactly (ohlcv.rs:40-45) — the bundled UI
    # (frontend.py drawChart) also scales them as nanos; a date string
    # here broke both parity and the chart's x-axis.
    return {
        "results": results,
        "min_date": lo_all,
        "max_date": hi_all,
    }


def duration_of_nanos(ns: int) -> str:
    """Render a nanosecond resolution as a Spark window duration string,
    in the largest unit that divides it evenly ("60000000000 → 1 minutes").
    Sub-microsecond resolutions cannot form a Spark window and raise."""
    if ns <= 0:
        raise ValueError(f"resolution must be positive, got {ns}")
    for unit, width in (("days", 86_400 * 10**9), ("hours", 3_600 * 10**9),
                        ("minutes", 60 * 10**9), ("seconds", 10**9),
                        ("milliseconds", 10**6), ("microseconds", 10**3)):
        if ns % width == 0:
            return f"{ns // width} {unit}"
    raise ValueError(
        f"resolution {ns}ns is sub-microsecond; Spark window durations "
        "bottom out at 1 microsecond — pass an explicit `every`")


def resample(df: DataFrame, every: str | None = None, ts_col: str = "ts",
             symbol_col: str | None = "sym",
             price_col: str | None = None,
             volume_col: str | None = "volume",
             ts_is_nanos: bool = True,
             resolution_ns: int | None = None) -> DataFrame:
    """Tumbling time-bucket OHLCV — the reference's unimplemented
    ``TODO: duration like 5Minutes`` (/root/reference/src/server/ohlcv.rs:56).

    Two modes:
    - ``price_col`` given: raw ticks → bars. open/close = price at min/max
      ts in bucket; high/low = max/min price; volume = sum.
    - ``price_col`` None: re-aggregate stored bars (expects open/high/low/
      close columns). open/close = open/close at min/max ts; high = max
      high; low = min low; volume = sum.

    ``every`` is any Spark window duration ("5 minutes", "1 hour", "1 day").
    When omitted, the bucket defaults to ``resolution_ns`` — the table's
    declared ts resolution (SURVEY §1.3: resolution survives as a semantic
    fact; ``Table.resample`` passes it automatically).  A 1 ns resolution
    (raw ticks, no declared bar width) has no meaningful default and
    raises.  Output columns: bucket_start (TimestampType), symbol (if
    given), open/high/low/close/volume.
    """
    if every is None:
        if resolution_ns is None:
            raise ValueError("pass `every`, or `resolution_ns` for the "
                             "declared-resolution default")
        if resolution_ns == 1:
            raise ValueError(
                "table resolution is 1 ns (raw ticks) — there is no "
                "declared bar width to default to; pass `every`")
        every = duration_of_nanos(resolution_ns)
    ts_utc = nanos_to_ts(ts_col) if ts_is_nanos else F.col(ts_col)
    w = F.window(ts_utc, every)
    keys = [w.alias("w")] + ([F.col(symbol_col)] if symbol_col else [])
    if price_col is not None:
        p = F.col(price_col)
        aggs = [
            F.min_by(p, F.col(ts_col)).alias("open"),
            F.max(p).alias("high"),
            F.min(p).alias("low"),
            F.max_by(p, F.col(ts_col)).alias("close"),
        ]
    else:
        aggs = [
            F.min_by("open", F.col(ts_col)).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", F.col(ts_col)).alias("close"),
        ]
    if volume_col:
        aggs.append(F.sum(volume_col).alias("volume"))
    out = df.groupBy(*keys).agg(*aggs)
    return out.select(F.col("w.start").alias("bucket_start"),
                      *([symbol_col] if symbol_col else []),
                      "open", "high", "low", "close",
                      *(["volume"] if volume_col else []))




# threshold_bars moved to operators/temporal.py in r18 (hoisted for
# composite coverage, the resample_ticks precedent); re-exported here
# so ohlcv-module users keep their import path.
from .operators.temporal import threshold_bars  # noqa: E402,F401

