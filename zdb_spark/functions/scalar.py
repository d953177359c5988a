"""Scalar function ports (SURVEY.md §2.6).

- ``string_to_nanoseconds`` — the reference's 3-format time parser
  (/root/reference/src/server/query.rs:47-69): a string of length > 4 that
  parses as an integer is taken as raw epoch-nanos; else RFC3339; else
  ``%Y-%m-%d`` at midnight UTC; else error.
- ``format_currency`` — significant-figure currency formatter
  (/root/reference/src/table/scan.rs:7-34): values with integer part >=
  10^sig_figs render in scientific notation; otherwise fixed-point with
  ``sig_figs - num_integer_digits`` decimals (min 1), then trailing zeros
  and a trailing '.' are trimmed.
- ``to_nanos`` / ``nanos_to_ts`` — column-level converters between epoch
  nanos (LongType, the canonical zdb physical type) and Spark's µs
  TimestampType (SURVEY.md §1.2 Timestamp row).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, functions as F

__all__ = ["string_to_nanoseconds", "format_currency", "format_currency_col",
           "to_nanos", "nanos_to_ts", "ts_to_nanos"]

_NICE_FORMAT = "%Y-%m-%d"
NANOS_PER_MICRO = 1_000
NANOS_PER_SEC = 1_000_000_000

_EPOCH = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)


def _dt_to_nanos(d: dt.datetime) -> int:
    """Exact integer nanos — avoids float-seconds precision loss (a double
    only holds ~µs precision at 2024 epochs)."""
    delta = d - _EPOCH
    return ((delta.days * 86_400 + delta.seconds) * NANOS_PER_SEC
            + delta.microseconds * NANOS_PER_MICRO)


def string_to_nanoseconds(value: str) -> int:
    """Parse raw-nanos | RFC3339 | %Y-%m-%d into epoch nanoseconds."""
    if len(value) > 4:
        try:
            return int(value)
        except ValueError:
            pass
    try:
        d = dt.datetime.fromisoformat(value)
        if d.tzinfo is None:
            d = d.replace(tzinfo=dt.timezone.utc)
        return _dt_to_nanos(d)
    except ValueError:
        pass
    try:
        d = dt.datetime.strptime(value, _NICE_FORMAT).replace(
            tzinfo=dt.timezone.utc)
        return int(d.timestamp()) * NANOS_PER_SEC
    except ValueError:
        raise ValueError(
            f"Could not parse {value} in RFC3339 or {_NICE_FORMAT} format")


def format_currency_col(col: Column | str, sig_figs: int = 5) -> Column:
    """Vectorized column form of ``format_currency`` (Arrow pandas UDF —
    string sig-fig formatting has no exact pyspark.sql.functions
    composition, and a per-batch vectorized UDF keeps it off the
    row-at-a-time path)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _fmt(s):  # type: ignore[no-untyped-def]
        return s.map(lambda v: None if v is None
                     else format_currency(float(v), sig_figs))

    c = F.col(col) if isinstance(col, str) else col
    return _fmt(c)


def format_currency(value: float, sig_figs: int = 5) -> str:
    """Significant-figure currency string, reference semantics."""
    if int(value) >= 10 ** sig_figs:
        res = f"{value:.{sig_figs - 4}e}"
    else:
        num_digits = 0
        tmp = value
        while tmp > 1.0:
            tmp /= 10.0
            num_digits += 1
        decimals = max(sig_figs - num_digits, 1)
        res = f"{value:<{num_digits}.{decimals}f}"
    return res.rstrip("0").rstrip(".")


# ---------------------------------------------------------------------- #
# column-level time converters                                            #
# ---------------------------------------------------------------------- #
def to_nanos(value: int | str | dt.datetime | dt.date) -> int:
    """Coerce a user-facing time value to epoch nanos (API boundary
    helper; public APIs speak nanos like the reference)."""
    if isinstance(value, int):
        return value
    if isinstance(value, str):
        return string_to_nanoseconds(value)
    if isinstance(value, dt.datetime):
        if value.tzinfo is None:
            value = value.replace(tzinfo=dt.timezone.utc)
        return _dt_to_nanos(value)
    if isinstance(value, dt.date):
        return to_nanos(dt.datetime(value.year, value.month, value.day))
    raise TypeError(f"cannot convert {type(value).__name__} to nanos")


def nanos_to_ts(col: Column | str) -> Column:
    """LongType epoch-nanos -> TimestampType (µs truncation)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_micros(_int_div(c, NANOS_PER_MICRO))


def _int_div(c: Column, divisor: int) -> Column:
    """Exact truncating integer division for long columns.

    Any route through ``/`` on longs converts the NUMERATOR to double
    first; at 2024-era epoch-nanos (~1.7e18 ≫ 2^53) that alone loses up
    to ~128 ns and lands off-by-one results.  Decimal(38,0) division is
    exact at any epoch; floor+cast recovers the truncated quotient.
    (For negative values floor ≠ truncate-toward-zero; epoch values
    here are post-1970 by contract.)
    """
    return F.floor(c.cast("decimal(38,0)") / F.lit(divisor)).cast("long")


def ts_to_nanos(col: Column | str) -> Column:
    """TimestampType -> LongType epoch-nanos (µs precision)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.unix_micros(c) * NANOS_PER_MICRO).cast("long")
