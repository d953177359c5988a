"""OHLCV endpoint + resample tests: golden values on a tiny deterministic
tick set (the reference's own strategy — seeded synthetic → exact asserts,
/root/reference/tests/main.rs:122-151)."""

import pytest

from pyspark.sql import Row

from zdb_spark.ohlcv import ohlcv, ohlcv_frame, resample
from zdb_spark.schema import ColumnType, PartitionBy, Schema
from zdb_spark.table import Table

NS = 1_000_000_000
MIN = 60 * NS
T0 = 1704067200 * NS  # 2024-01-01T00:00:00Z


def bar_schema(name="bars"):
    return (Schema(name)
            .add_col("sym", ColumnType.SYMBOL16)
            .add_col("open", ColumnType.F64)
            .add_col("high", ColumnType.F64)
            .add_col("low", ColumnType.F64)
            .add_col("close", ColumnType.F64)
            .add_col("volume", ColumnType.U64)
            .with_partition_by(PartitionBy.DAY))


@pytest.fixture()
def bar_table(spark, tmp_home):
    t = Table.create(spark, bar_schema(), home=tmp_home)
    rows = []
    for i in range(4):  # 4 one-minute bars, 2 symbols interleaved
        for sym, base in (("AAPL", 100.0), ("MSFT", 200.0)):
            rows.append(Row(ts=T0 + i * MIN, sym=sym,
                            open=base + i, high=base + i + 1.0,
                            low=base + i - 1.0, close=base + i + 0.5,
                            volume=10 * (i + 1)))
    t.write(spark.createDataFrame(rows))
    return t


class TestOhlcvEndpoint:
    def test_frame_symbol_filter(self, bar_table):
        df = ohlcv_frame(bar_table, T0, T0 + 10 * MIN, symbols=["AAPL"])
        assert df.count() == 4
        assert {r["sym"] for r in df.select("sym").collect()} == {"AAPL"}

    def test_frame_all_symbols(self, bar_table):
        assert ohlcv_frame(bar_table, T0, T0 + 10 * MIN).count() == 8

    def test_frame_stays_lazy(self, bar_table, monkeypatch):
        """ohlcv_frame is the UNBOUNDED path: building it must never
        materialize rows on the driver — only ohlcv() (the JSON
        endpoint serializer, whose driver materialization is
        caller-bounded) collects.  Pins the docstring contract by
        poisoning the materialization entry points for the call."""
        import pytest

        # patch the CONCRETE class (pyspark 4's classic DataFrame
        # overrides the pyspark.sql.DataFrame base methods)
        DataFrame = type(bar_table.spark.range(1))

        def boom(self, *a, **k):
            raise AssertionError("driver materialization in frame path")

        for meth in ("collect", "toPandas", "toLocalIterator"):
            monkeypatch.setattr(DataFrame, meth, boom)
        df = ohlcv_frame(bar_table, T0, T0 + 10 * MIN,
                         symbols=["AAPL"])      # must not raise
        assert df.is_cached is False
        with pytest.raises(AssertionError, match="materialization"):
            ohlcv(bar_table, T0, T0 + 10 * MIN, symbols=["AAPL"])

    def test_reversed_range_swapped(self, bar_table):
        # reference swaps from>to (/root/reference/src/server/ohlcv.rs:64-66)
        assert ohlcv_frame(bar_table, T0 + 10 * MIN, T0).count() == 8

    def test_api_shape(self, bar_table):
        out = ohlcv(bar_table, T0, T0 + 10 * MIN, symbols=["AAPL", "MSFT"])
        assert set(out) == {"results", "min_date", "max_date"}
        # i64 epoch nanos, the reference's OHLCVsResponse field type
        assert out["min_date"] == T0
        a = out["results"]["AAPL"]
        assert a["t"] == [T0 + i * MIN for i in range(4)]
        assert a["o"] == [100.0, 101.0, 102.0, 103.0]
        assert a["h"] == [101.0, 102.0, 103.0, 104.0]
        assert a["v"] == [10, 20, 30, 40]


class TestResample:
    def test_bars_to_coarser_bars(self, bar_table):
        out = (resample(bar_table.scan(), "2 minutes")
               .orderBy("sym", "bucket_start").collect())
        assert len(out) == 4  # 2 syms × 2 buckets
        first_aapl = [r for r in out if r["sym"] == "AAPL"][0]
        assert first_aapl["open"] == 100.0   # open at min ts
        assert first_aapl["close"] == 101.5  # close at max ts
        assert first_aapl["high"] == 102.0   # max high over bucket
        assert first_aapl["low"] == 99.0     # min low
        assert first_aapl["volume"] == 30    # 10 + 20

    def test_parse_every_aliases(self):
        from zdb_spark.ohlcv import parse_every
        import pytest as _pytest

        assert parse_every("5m") == "5 minutes"
        assert parse_every("5Minutes") == "5 minutes"   # the TODO spelling
        assert parse_every("1h") == "1 hours"
        assert parse_every("30 s") == "30 seconds"
        assert parse_every("2 days") == "2 days"
        for bad in ("", "fast", "5x", "m5", "0m", "0 seconds", None):
            with _pytest.raises(ValueError, match="cannot parse"):
                parse_every(bad)

    def test_api_every_resamples(self, bar_table):
        out = ohlcv(bar_table, T0, T0 + 10 * MIN, symbols=["AAPL"],
                    every="2m")
        a = out["results"]["AAPL"]
        assert a["t"] == [T0, T0 + 2 * MIN]      # bucket-start nanos
        assert a["o"] == [100.0, 102.0]          # open at bucket min ts
        assert a["h"] == [102.0, 104.0]          # max high over bucket
        assert a["c"] == [101.5, 103.5]          # close at bucket max ts
        assert a["v"] == [30, 70]                # summed volume

    def test_resolution_default_matches_explicit(self, bar_table):
        explicit = (resample(bar_table.scan(), "2 minutes")
                    .orderBy("sym", "bucket_start").collect())
        defaulted = (resample(bar_table.scan(), None,
                              resolution_ns=2 * MIN)
                     .orderBy("sym", "bucket_start").collect())
        assert explicit == defaulted

    def test_table_resample_uses_declared_resolution(self, spark, tmp_path):
        # a "1-minute bars" table: t.resample() re-emits 1-minute buckets
        # without the caller restating the width; explicit every overrides
        t = Table.create(spark,
                         bar_schema("bars_res").with_resolution(MIN),
                         home=str(tmp_path / "res"))
        rows = [Row(ts=T0 + i * MIN, sym="AAPL", open=100.0 + i,
                    high=101.0 + i, low=99.0 + i, close=100.5 + i,
                    volume=10) for i in range(4)]
        t.write(spark.createDataFrame(rows))
        out = t.resample().orderBy("bucket_start").collect()
        assert len(out) == 4                      # identity at declared res
        assert [r["open"] for r in out] == [100.0, 101.0, 102.0, 103.0]
        coarser = t.resample(every="2 minutes").orderBy("bucket_start") \
            .collect()
        assert len(coarser) == 2
        assert coarser[0]["open"] == 100.0 and coarser[0]["close"] == 101.5

    def test_no_resolution_no_every_raises(self, bar_table):
        import pytest as _pytest

        # default resolution is 1 ns (raw ticks): no meaningful default
        with _pytest.raises(ValueError, match="raw ticks"):
            bar_table.resample()
        with _pytest.raises(ValueError, match="every"):
            resample(bar_table.scan(), None)

    def test_duration_of_nanos_units(self):
        from zdb_spark.ohlcv import duration_of_nanos
        import pytest as _pytest

        assert duration_of_nanos(60 * NS) == "1 minutes"
        assert duration_of_nanos(90 * NS) == "90 seconds"
        assert duration_of_nanos(86_400 * NS) == "1 days"
        assert duration_of_nanos(5_000_000) == "5 milliseconds"
        assert duration_of_nanos(1_000) == "1 microseconds"
        with _pytest.raises(ValueError, match="sub-microsecond"):
            duration_of_nanos(500)
        with _pytest.raises(ValueError, match="positive"):
            duration_of_nanos(0)

    def test_ticks_to_bars(self, spark):
        ticks = spark.createDataFrame(
            [Row(ts=T0 + i * 10 * NS, sym="X", price=float(i), size=1)
             for i in range(12)])  # 2 minutes of 10s ticks
        out = (resample(ticks, "1 minute", price_col="price",
                        volume_col="size")
               .orderBy("bucket_start").collect())
        assert len(out) == 2
        assert out[0]["open"] == 0.0 and out[0]["close"] == 5.0
        assert out[1]["open"] == 6.0 and out[1]["close"] == 11.0
        assert out[0]["high"] == 5.0 and out[0]["low"] == 0.0
        assert out[0]["volume"] == 6


class TestThresholdBars:
    """Volume/dollar bars (ohlcv.py:threshold_bars): closed-form bar
    assignment by prefix sum, OHLC within each bar, loud refusals."""

    def test_volume_bars_small(self, spark):
        import pytest

        from zdb_spark.ohlcv import threshold_bars

        # one symbol, sizes 4,4,4,4: threshold 10 -> cum_before
        # 0,4,8,12 -> bars 0,0,0,1
        rows = [(i, 1000 + i, "A", float(10 + i), 4.0)
                for i in range(4)]
        df = spark.createDataFrame(
            rows, "event_id long, ts long, sym string, price double, "
                  "sz double")
        out = {(r.sym, r.bar): r for r in threshold_bars(
            df, "ts", "sym", "price", "sz", threshold=10.0,
            tie_col="event_id").collect()}
        b0, b1 = out[("A", 0)], out[("A", 1)]
        assert (b0.n_ticks, b1.n_ticks) == (3, 1)
        assert (b0.open, b0.high, b0.low, b0.close) == (10, 12, 10, 12)
        assert (b1.open, b1.close) == (13, 13)
        assert b0.bar_size == 12.0 and b1.bar_size == 4.0
        assert (b0.start_ts, b0.end_ts) == (1000, 1002)

        # duplicate timestamps: the tie column decides open/close
        dup = spark.createDataFrame(
            [(2, 1000, "A", 5.0, 1.0), (1, 1000, "A", 7.0, 1.0)],
            "event_id long, ts long, sym string, price double, "
            "sz double")
        r = threshold_bars(dup, "ts", "sym", "price", "sz",
                           threshold=100.0,
                           tie_col="event_id").collect()[0]
        assert (r.open, r.close) == (7.0, 5.0)

        with pytest.raises(ValueError, match="positive"):
            threshold_bars(df, "ts", "sym", "price", "sz",
                           threshold=0, tie_col="event_id")
        # negative sizes refuse loudly AT RUN TIME
        neg = spark.createDataFrame(
            [(1, 1000, "A", 5.0, -1.0)],
            "event_id long, ts long, sym string, price double, "
            "sz double")
        with pytest.raises(Exception, match="negative or NULL size"):
            threshold_bars(neg, "ts", "sym", "price", "sz",
                           threshold=10.0,
                           tie_col="event_id").collect()
        # NULL sizes refuse too — `size < 0` is NULL for NULL, which
        # would otherwise route ticks into a silent bar=NULL group
        # (r15 review finding)
        nul = spark.createDataFrame(
            [(1, 1000, "A", 5.0, None)],
            "event_id long, ts long, sym string, price double, "
            "sz double")
        with pytest.raises(Exception, match="negative or NULL size"):
            threshold_bars(nul, "ts", "sym", "price", "sz",
                           threshold=10.0,
                           tie_col="event_id").collect()

    def test_dollar_bars_form(self, spark):
        # dollar bars = threshold_bars with price*volume as the size
        # column (the docstring's second form): thresholds cross on
        # notional, not tick count
        from pyspark.sql import functions as F

        from zdb_spark.ohlcv import threshold_bars

        rows = [(i, 1000 + i, "A", 10.0 + i, 2.0) for i in range(6)]
        df = (spark.createDataFrame(
                  rows, "event_id long, ts long, sym string, "
                        "price double, vol double")
              .withColumn("dollar", F.col("price") * F.col("vol")))
        # notionals: 20,22,24,26,28,30; cum_before 0,20,42,68,94,122
        # threshold 60 -> bars 0,0,0,1,1,2
        out = {r.bar: r for r in threshold_bars(
            df, "ts", "sym", "price", "dollar", threshold=60.0,
            tie_col="event_id").collect()}
        assert sorted(out) == [0, 1, 2]
        assert (out[0].n_ticks, out[1].n_ticks, out[2].n_ticks) == \
            (3, 2, 1)
        assert out[0].bar_size == 66.0 and out[2].open == 15.0
