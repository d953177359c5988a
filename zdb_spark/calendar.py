"""US equity trading calendar (capability parity with the reference's
``is_market_open``, /root/reference/src/calendar/us_equity.rs:28-122, and
``get_easter``, :7-24 — the anonymous Gregorian computus).

Holiday rules (all observed-day logic per NYSE practice, as the reference
implements):
- weekends
- New Year's Day (moved FORWARD past a weekend — Jan 1 Sat/Sun → next Mon)
- MLK Day (3rd Monday of January)
- Washington's Birthday (3rd Monday of February)
- Good Friday (Easter − 2 days)
- Memorial Day (last Monday of May)
- Independence Day (Jul 4; Sat → Jul 3, Sun → Jul 5)
- Labor Day (1st Monday of September)
- Thanksgiving (4th Thursday of November)
- Christmas (Dec 25; Sat → Dec 24, Sun → Dec 26)
- ad-hoc closures: 2004-06-11 (Reagan), 2007-01-02 (Ford), 2012-10-29/30
  (Hurricane Sandy), 2018-12-05 (G.H.W. Bush)

The scalable Spark form is a generated holiday DIMENSION TABLE broadcast-
joined against fact data (SURVEY.md §2.6 F4) — a Python UDF would drag every
row through the interpreter.  Both forms are exposed.
"""

from __future__ import annotations

import datetime as dt
import functools

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["easter", "is_market_open", "market_holidays", "holiday_df",
           "with_market_open"]

# Ad-hoc market closures hardcoded in the reference
# (/root/reference/src/calendar/us_equity.rs:103-115).
_DISASTERS = frozenset({
    dt.date(2004, 6, 11),   # Reagan funeral
    dt.date(2007, 1, 2),    # Ford funeral
    dt.date(2012, 10, 29),  # Hurricane Sandy
    dt.date(2012, 10, 30),  # Hurricane Sandy
    dt.date(2018, 12, 5),   # G.H.W. Bush funeral
})


@functools.lru_cache(maxsize=512)
def easter(year: int) -> dt.date:
    """Gregorian Easter Sunday (anonymous/Meeus computus — public
    algorithm; same one the reference uses)."""
    a = year % 19
    b, c = divmod(year, 100)
    d, e = divmod(b, 4)
    f = (b + 8) // 25
    g = (b - f + 1) // 3
    h = (19 * a + b - d - g + 15) % 30
    i, k = divmod(c, 4)
    l = (32 + 2 * e + 2 * i - h - k) % 7
    m = (a + 11 * h + 22 * l) // 451
    month, day = divmod(h + l - 7 * m + 114, 31)
    return dt.date(year, month, day + 1)


def _nth_weekday(year: int, month: int, weekday: int, n: int) -> dt.date:
    """n-th given weekday (Mon=0) of a month."""
    first = dt.date(year, month, 1)
    offset = (weekday - first.weekday()) % 7
    return first + dt.timedelta(days=offset + 7 * (n - 1))


def _last_weekday(year: int, month: int, last_day: int, weekday: int) -> dt.date:
    d = dt.date(year, month, last_day)
    while d.weekday() != weekday:
        d -= dt.timedelta(days=1)
    return d


@functools.lru_cache(maxsize=512)
def market_holidays(year: int) -> frozenset[dt.date]:
    """All non-weekend closure dates for a year."""
    hols: set[dt.date] = set()

    new_year = dt.date(year, 1, 1)
    while new_year.weekday() >= 5:          # roll forward past weekend
        new_year += dt.timedelta(days=1)
    hols.add(new_year)

    hols.add(_nth_weekday(year, 1, 0, 3))   # MLK: 3rd Mon Jan
    hols.add(_nth_weekday(year, 2, 0, 3))   # Washington: 3rd Mon Feb
    hols.add(easter(year) - dt.timedelta(days=2))  # Good Friday
    hols.add(_last_weekday(year, 5, 31, 0))  # Memorial: last Mon May

    jul4 = dt.date(year, 7, 4)
    if jul4.weekday() == 5:
        jul4 -= dt.timedelta(days=1)
    elif jul4.weekday() == 6:
        jul4 += dt.timedelta(days=1)
    hols.add(jul4)

    hols.add(_nth_weekday(year, 9, 0, 1))   # Labor: 1st Mon Sep
    hols.add(_nth_weekday(year, 11, 3, 4))  # Thanksgiving: 4th Thu Nov

    xmas = dt.date(year, 12, 25)
    if xmas.weekday() == 5:
        xmas -= dt.timedelta(days=1)
    elif xmas.weekday() == 6:
        xmas += dt.timedelta(days=1)
    hols.add(xmas)

    hols.update(d for d in _DISASTERS if d.year == year)
    return frozenset(hols)


def is_market_open(date: dt.date) -> bool:
    """Scalar parity API (/root/reference/src/calendar/us_equity.rs:28)."""
    if date.weekday() >= 5:
        return False
    return date not in market_holidays(date.year)


def holiday_df(spark: SparkSession, start_year: int, end_year: int) -> DataFrame:
    """Holiday dimension table for [start_year, end_year] — the broadcast-
    join form.  Tiny (≤ ~15 rows/year), generated driver-side once."""
    rows = [(d,) for y in range(start_year, end_year + 1)
            for d in sorted(market_holidays(y))]
    return spark.createDataFrame(rows, "holiday date")


def with_market_open(df: DataFrame, date_col: str,
                     out_col: str = "market_open") -> DataFrame:
    """Append a boolean ``market_open`` column via broadcast anti-semantics:
    open = weekday AND not in holiday dim.  Join stays JVM-side and
    broadcastable at any fact-table scale."""
    spark = df.sparkSession
    years = df.select(
        F.min(F.year(date_col)).alias("lo"),
        F.max(F.year(date_col)).alias("hi")).collect()[0]
    if years["lo"] is None:
        return df.withColumn(out_col, F.lit(None).cast("boolean"))
    # collision-safe internal name: a fact table may legitimately carry
    # its own 'holiday' column (ambiguous-reference AnalysisException,
    # or worse, .drop would remove the user's column)
    hols = (holiday_df(spark, int(years["lo"]), int(years["hi"]))
            .withColumnRenamed("holiday", "_zdb_holiday"))
    d = F.to_date(F.col(date_col))
    return (df.join(F.broadcast(hols), d == F.col("_zdb_holiday"), "left")
              .withColumn(out_col,
                          (~F.dayofweek(d).isin(1, 7))
                          & F.col("_zdb_holiday").isNull())
              .drop("_zdb_holiday"))
