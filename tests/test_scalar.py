"""Scalar-function unit tests (SURVEY.md §2.6): the 3-format time parser,
the sig-fig currency formatter, and the exact nanos↔timestamp converters
(including the 2^53 double-precision hazard the converters exist to avoid)."""

import datetime as dt

import pytest

from pyspark.sql import Row, functions as F

from zdb_spark.functions.scalar import (
    format_currency, nanos_to_ts, string_to_nanoseconds, to_nanos,
    ts_to_nanos)

NS = 1_000_000_000


class TestStringToNanoseconds:
    def test_raw_nanos(self):
        assert string_to_nanoseconds("1704067200000000000") == 1704067200 * NS

    def test_date_only(self):
        assert string_to_nanoseconds("2024-01-01") == 1704067200 * NS

    def test_rfc3339(self):
        assert (string_to_nanoseconds("2024-01-01T06:30:00+00:00")
                == (1704067200 + 6 * 3600 + 30 * 60) * NS)

    def test_rfc3339_offset(self):
        # -05:00 offset = +5h in UTC
        assert (string_to_nanoseconds("2024-01-01T00:00:00-05:00")
                == (1704067200 + 5 * 3600) * NS)

    def test_unparseable(self):
        with pytest.raises(ValueError, match="Could not parse"):
            string_to_nanoseconds("not-a-date")

    def test_short_number_is_not_nanos(self):
        # length <= 4 never parses as raw nanos (reference rule)
        with pytest.raises(ValueError):
            string_to_nanoseconds("1234")


class TestFormatCurrency:
    def test_small_value(self):
        assert format_currency(1.5, 5) == "1.5"

    def test_trims_zeros(self):
        assert format_currency(2.0, 5) == "2"

    def test_mid_value(self):
        assert format_currency(123.456, 5) == "123.46"

    def test_large_scientific(self):
        out = format_currency(1_000_000.0, 5)
        assert "e" in out

    def test_column_form_matches_scalar(self, spark):
        from zdb_spark.functions.scalar import format_currency_col

        vals = [1.5, 2.0, 123.456, 0.5]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = [r["s"] for r in
               df.select(format_currency_col("v").alias("s")).collect()]
        assert got == [format_currency(v) for v in vals]

    def test_expression_parity_sweep(self, spark):
        """The Catalyst-expression column form must match the scalar
        across magnitudes, signs, powers of ten, the fixed/sci boundary,
        sci carries, and the exponent-zero-trim quirk."""
        from zdb_spark.functions.scalar import format_currency_col

        vals = [0.0, 0.0001, 0.5, 1.0, 1.5, 2.0, 3.14159, 9.999,
                10.0, 10.5, 99.99, 100.0, 123.456, 999.999, 1000.0,
                9999.5, 12345.6, 99999.0, 99999.9,
                100000.0, 123456.0, 999999.5, 1e6, 9.87e8, 1e9,
                1.23e10,  # '1.2e+10' -> trailing-zero trim eats exp zero
                -0.5, -5.0, -123.456, -123456.0]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = [r["s"] for r in
               df.select(format_currency_col("v").alias("s")).collect()]
        assert got == [format_currency(v) for v in vals]

    def test_no_python_in_plan(self, spark):
        from zdb_spark.functions.scalar import format_currency_col

        df = spark.createDataFrame([(1.5,)], "v double") \
            .select(format_currency_col("v").alias("s"))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan


class TestToNanos:
    def test_int_passthrough(self):
        assert to_nanos(42) == 42

    def test_datetime(self):
        assert to_nanos(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)) \
            == 1704067200 * NS

    def test_date(self):
        assert to_nanos(dt.date(2024, 1, 1)) == 1704067200 * NS

    def test_string(self):
        assert to_nanos("2024-01-01") == 1704067200 * NS


class TestColumnConverters:
    def test_nanos_to_ts_exact_at_2024_epoch(self, spark):
        # 1704067200.123456789s — the ns→µs truncation must be exact;
        # a double-division route is off by ~128ns at this magnitude.
        nanos = 1704067200_123_456_789
        row = (spark.createDataFrame([Row(ts=nanos)])
               .select(nanos_to_ts("ts").alias("t"),
                       F.unix_micros(nanos_to_ts("ts")).alias("us"))
               .collect()[0])
        assert row["us"] == 1704067200_123_456

    def test_roundtrip(self, spark):
        nanos = 1704067200_123_456_000  # µs-aligned → exact roundtrip
        row = (spark.createDataFrame([Row(ts=nanos)])
               .select(ts_to_nanos(nanos_to_ts("ts")).alias("back"))
               .collect()[0])
        assert row["back"] == nanos
