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
           "to_nanos", "nanos_to_ts", "ts_to_nanos", "parse_time_col",
           "round0"]


def round0(col: Column, dp: int) -> Column:
    """``F.round`` with IEEE signed zero normalized to ``+0.0``.

    A value like ``-1e-9`` rounds to ``-0.0`` at 6 dp.  ``-0.0 == 0.0``
    compares true everywhere, but the two have different bit patterns —
    invisible to every tolerance check and fatal to any byte-level value
    hash when one engine emits ``+0.0`` and another ``-0.0`` for the
    same cell (Spark vs DuckDB genuinely disagree here; the round-11
    ``embedding_covariance`` red gate was exactly cells (5,9)/(9,5)).
    The fix is the standard IEEE-754 identity ``-0.0 + 0.0 == +0.0``
    (round-to-nearest mode), a no-op for every other value including
    NULL and NaN.  Every hash-gated float an operator emits after its
    final rounding should go through this (mirror it as ``+ 0.0`` after
    ``round(...)`` in the paired oracle SQL).
    """
    return F.round(col, dp) + F.lit(0.0)

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
    """Column form of ``format_currency`` as a pure Catalyst expression —
    zero Python anywhere in the path (the earlier pandas-UDF form was the
    repo's only per-row Python; this stays inside whole-stage codegen).

    Fixed-point branch (integer part < 10^sig_figs): ``format_number``
    (HALF_EVEN, like CPython's float formatting) at the same
    ``max(sig_figs - int_digits, 1)`` decimals as the scalar — the
    int-digit count only disagrees with the scalar's divide-by-10 loop at
    exact powers of ten, where the fraction is zero and the trailing-zero
    trim erases the difference.  Scientific branch (integer part >=
    10^sig_figs, reference scan.rs:7-34): mantissa digits come from
    ``bround`` (half-even) of ``v / 10^floor(log10 v)`` with an explicit
    9.99→10.0 carry, exponent zero-padded to two digits like ``%e``.
    Both branches then trim trailing zeros and a trailing '.' exactly
    like the scalar — including its quirk of eating a final exponent
    zero (``1.2e+10`` → ``1.2e+1``), which is reference behavior.

    Known divergence: JVM decimal formatting rounds a double's SHORTEST
    decimal representation, CPython rounds the exact binary value; the
    two differ only for adversarially constructed exact decimal ties
    (e.g. 2.675 at 2 decimals), not for values that survive arithmetic.
    """
    if sig_figs < 4:
        raise ValueError("sig_figs must be >= 4")
    c = F.col(col) if isinstance(col, str) else col

    # ---- fixed-point branch: v's integer part has nd digits ---------- #
    nd = (F.when(c > F.lit(1.0),
                 F.length(c.cast("long").cast("string")))
          .otherwise(F.lit(0)))
    fixed = None
    for n in range(sig_figs, -1, -1):   # nd <= sig_figs in this branch
        d = max(sig_figs - n, 1)
        s = F.regexp_replace(F.format_number(c, d), ",", "")
        fixed = s if fixed is None else \
            F.when(nd == F.lit(n), s).otherwise(fixed)

    # ---- scientific branch ------------------------------------------- #
    dm = sig_figs - 4                       # mantissa decimals, like %.{dm}e
    exp = F.floor(F.log10(c)).cast("long")
    scaled = c / F.power(F.lit(10.0), exp.cast("double"))
    digits0 = F.bround(scaled * F.lit(float(10 ** dm)), 0).cast("long")
    carry = digits0 >= F.lit(10 ** (dm + 1))
    digits = F.when(carry, F.lit(10 ** dm)).otherwise(digits0)
    exp2 = F.when(carry, exp + 1).otherwise(exp)
    ds = digits.cast("string")
    mantissa = (F.concat(F.substring(ds, 1, 1), F.lit("."),
                         F.substring(ds, 2, dm))
                if dm > 0 else F.substring(ds, 1, 1))
    sci = F.concat(mantissa, F.lit("e+"),
                   F.lpad(exp2.cast("string"), 2, "0"))

    raw = F.when(F.floor(c) >= F.lit(float(10 ** sig_figs)), sci) \
        .otherwise(fixed)
    # scalar's res.rstrip("0").rstrip(".")
    return F.regexp_replace(F.regexp_replace(raw, "0+$", ""), r"\.$", "")


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


def parse_time_col(col: Column | str) -> Column:
    """Column twin of ``string_to_nanoseconds`` (F1, src/lib.zig
    stringToNanoseconds): parse raw-nanos | RFC3339 | %Y-%m-%d strings to
    epoch-nanos i64 — as a pure Catalyst expression (whole-stage codegen,
    no Python), dispatching on shape exactly like the scalar:

    - all-digits and longer than 4 chars -> the literal nano count,
    - a bare ``YYYY-MM-DD`` -> midnight UTC of that day,
    - otherwise an ISO-8601/RFC3339 timestamp (fractional seconds kept
      to µs — Spark timestamps carry µs, matching ``ts_to_nanos``).

    Unparseable strings yield NULL (the SQL-expression analogue of the
    scalar's ValueError; a Column cannot raise per-row).
    """
    c = F.col(col) if isinstance(col, str) else col
    is_raw = (F.length(c) > 4) & c.rlike("^[0-9]+$")
    is_date = c.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$")
    iso_ns = (F.unix_micros(F.to_timestamp(c)) * NANOS_PER_MICRO)
    date_ns = (F.unix_date(F.to_date(c, "yyyy-MM-dd")).cast("long")
               * F.lit(86_400 * NANOS_PER_SEC))
    return (F.when(is_raw, c.cast("long"))
             .when(is_date, date_ns)
             .otherwise(iso_ns)
             .cast("long"))
