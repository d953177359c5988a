"""End-to-end golden-value test mirroring the reference's own strategy
(/root/reference/tests/main.rs:122-259): a seeded deterministic generator
writes OHLCV bars through the full Table write path, then the SAME sums
are computed three ways — native DataFrame scan, the /q UDF engine
(parallel fold), and the /q ordered exact-emulation — and must agree to
the cent.  This is the engine-vs-native cross-check (`sum_ohlcv_rust` vs
`sum_ohlcv_julia`) re-expressed for Spark."""

import random

import pytest

from pyspark.sql import Row, functions as F

from zdb_spark.query import Engine, q
from zdb_spark.schema import ColumnType, PartitionBy, Schema
from zdb_spark.table import Table

NS = 1_000_000_000
MIN = 60 * NS
T0 = 1704067200 * NS  # 2024-01-01T00:00:00Z

N_ROWS = 3 * 24 * 60  # 3 days of 1-minute bars (reference uses 1 day + 100)
SYMS = ["AAPL", "MSFT", "GOOG", "AMZN", "TSLA"]


@pytest.fixture(scope="module")
def golden(spark, tmp_path_factory):
    """Seeded generator → Table → (table, python-side golden sums)."""
    home = str(tmp_path_factory.mktemp("golden_home"))
    rng = random.Random(0)
    rows, sums = [], {"open": 0.0, "volume": 0}
    for i in range(N_ROWS):
        o = round(rng.uniform(1, 500), 2)
        v = rng.randrange(0, 10**6)
        rows.append(Row(ts=T0 + i * MIN, sym=rng.choice(SYMS),
                        open=o, high=o + 1.0, low=o - 1.0,
                        close=o + 0.5, volume=v))
        sums["open"] += o
        sums["volume"] += v
    schema = (Schema("agg1m_test")
              .add_col("sym", ColumnType.SYMBOL16)
              .add_col("open", ColumnType.F64)
              .add_col("high", ColumnType.F64)
              .add_col("low", ColumnType.F64)
              .add_col("close", ColumnType.F64)
              .add_col("volume", ColumnType.U64)
              .with_partition_by(PartitionBy.DAY))
    t = Table.create(spark, schema, home=home)
    assert t.write(spark.createDataFrame(rows)) == N_ROWS
    return t, sums, home


class TestGoldenCrossCheck:
    def test_native_scan_sums(self, golden):
        t, sums, _ = golden
        got = (t.scan(T0, T0 + N_ROWS * MIN)
               .agg(F.sum("open").alias("o"), F.sum("volume").alias("v"),
                    F.count(F.lit(1)).alias("n")).collect()[0])
        assert got["n"] == N_ROWS
        assert abs(got["o"] - sums["open"]) < 1e-6
        assert got["v"] == sums["volume"]

    def test_q_parallel_fold_matches_native(self, golden):
        t, sums, _ = golden
        res = q(t, lambda open, volume: (float(open.sum()), int(volume.sum())),
                T0, T0 + N_ROWS * MIN,
                combine=lambda a, b: (a[0] + b[0], a[1] + b[1]))
        assert abs(res[0] - sums["open"]) < 1e-6
        assert res[1] == sums["volume"]

    def test_q_ordered_fold_matches_native(self, golden):
        t, sums, _ = golden
        state = {"o": 0.0, "v": 0}

        def scan(open, volume):
            state["o"] += float(open.sum())
            state["v"] += int(volume.sum())
            return (state["o"], state["v"])

        res = q(t, scan, T0, T0 + N_ROWS * MIN, ordered=True)
        assert abs(res[0] - sums["open"]) < 1e-6
        assert res[1] == sums["volume"]

    def test_sql_matches_native(self, golden):
        t, sums, home = golden
        eng = Engine(t.spark, home=home)
        eng.register("agg1m_test")
        got = eng.sql("SELECT sum(open) AS o, sum(volume) AS v "
                      "FROM agg1m_test").collect()[0]
        assert abs(got["o"] - sums["open"]) < 1e-6
        assert got["v"] == sums["volume"]

    def test_partition_layout(self, golden):
        t, _, _ = golden
        dts = sorted(r["dt"] for r in t.df().select("dt").distinct().collect())
        assert [str(d) for d in dts] == ["2024-01-01", "2024-01-02",
                                         "2024-01-03"]

    def test_symbols_dictionary(self, golden):
        t, _, _ = golden
        assert t.symbols("sym") == sorted(SYMS)
