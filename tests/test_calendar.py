"""Trading-calendar unit tests, mirroring the reference's own test set
(/root/reference/src/calendar/us_equity.rs:124-178): known MLK, Washington,
Easter/Good Friday, Memorial, Labor, Thanksgiving, Christmas dates plus
weekend/observed-day shifts and ad-hoc closures."""

import datetime as dt

from zdb_spark.calendar import easter, is_market_open, market_holidays


def d(y, m, day):
    return dt.date(y, m, day)


def test_easter_known_dates():
    assert easter(2019) == d(2019, 4, 21)
    assert easter(2020) == d(2020, 4, 12)
    assert easter(2021) == d(2021, 4, 4)
    assert easter(2024) == d(2024, 3, 31)
    assert easter(2038) == d(2038, 4, 25)  # latest possible Easter


def test_weekends_closed():
    assert not is_market_open(d(2024, 1, 6))   # Saturday
    assert not is_market_open(d(2024, 1, 7))   # Sunday
    assert is_market_open(d(2024, 1, 5))       # Friday


def test_new_years_observed():
    assert not is_market_open(d(2024, 1, 1))
    # 2022-01-01 was a Saturday; NYSE rolls forward → Mon 2022-01-03 closed
    assert not is_market_open(d(2022, 1, 3))


def test_mlk_and_washington():
    assert not is_market_open(d(2024, 1, 15))   # MLK: 3rd Mon Jan 2024
    assert not is_market_open(d(2024, 2, 19))   # Washington: 3rd Mon Feb
    assert is_market_open(d(2024, 1, 16))


def test_good_friday():
    assert not is_market_open(d(2024, 3, 29))
    assert not is_market_open(d(2021, 4, 2))


def test_memorial_labor():
    assert not is_market_open(d(2024, 5, 27))   # last Mon May
    assert not is_market_open(d(2024, 9, 2))    # 1st Mon Sep


def test_july4_observed():
    assert not is_market_open(d(2024, 7, 4))
    # 2020-07-04 Sat → observed Fri 2020-07-03
    assert not is_market_open(d(2020, 7, 3))
    # 2021-07-04 Sun → observed Mon 2021-07-05
    assert not is_market_open(d(2021, 7, 5))


def test_thanksgiving_christmas():
    assert not is_market_open(d(2024, 11, 28))  # 4th Thu Nov
    assert not is_market_open(d(2024, 12, 25))
    # 2021-12-25 Sat → observed Fri 2021-12-24
    assert not is_market_open(d(2021, 12, 24))
    # 2022-12-25 Sun → observed Mon 2022-12-26
    assert not is_market_open(d(2022, 12, 26))


def test_adhoc_closures():
    assert not is_market_open(d(2004, 6, 11))   # Reagan funeral
    assert not is_market_open(d(2012, 10, 29))  # Sandy
    assert not is_market_open(d(2012, 10, 30))
    assert not is_market_open(d(2018, 12, 5))   # Bush funeral


def test_regular_days_open():
    assert is_market_open(d(2024, 3, 14))
    assert is_market_open(d(2024, 6, 18))
    assert is_market_open(d(2024, 10, 8))


def test_holiday_counts_reasonable():
    for year in (2020, 2021, 2022, 2023, 2024):
        n = len(market_holidays(year))
        assert 9 <= n <= 11, f"{year}: {n} holidays"
