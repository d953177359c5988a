"""Tests for the /q compatibility surface (SURVEY.md §2.5): projection
inference from the scan function's signature, parallel partial-fold,
ordered sequential-fold emulation, and the SQL pass-through."""

import pytest

from pyspark.sql import Row

from zdb_spark.query import Engine, q
from zdb_spark.schema import ColumnType, PartitionBy, Schema
from zdb_spark.table import Table

NS = 1_000_000_000
DAY = 86_400 * NS
T0 = 1704067200 * NS


@pytest.fixture()
def ticks(spark, tmp_home):
    schema = (Schema("ticks")
              .add_col("sym", ColumnType.SYMBOL16)
              .add_col("price", ColumnType.F64)
              .with_partition_by(PartitionBy.DAY))
    t = Table.create(spark, schema, home=tmp_home)
    t.write(spark.createDataFrame(
        [Row(ts=T0 + i * DAY // 4, sym="A", price=float(i + 1))
         for i in range(8)]))  # prices 1..8 across 2 days
    return t


class TestQ:
    def test_partial_fold_sum(self, ticks):
        # default combine: partials reduced with `+`
        assert q(ticks, lambda price: price.sum(), T0, T0 + 10 * DAY) == 36.0

    def test_projection_from_signature(self, ticks):
        # uses two columns by name
        res = q(ticks, lambda ts, price: float(len(ts) + price.sum()),
                T0, T0 + 10 * DAY)
        assert res == 44.0  # 8 rows + sum 36

    def test_unknown_column_raises(self, ticks):
        from zdb_spark.query import QueryError

        with pytest.raises(QueryError, match="column nope does not exist"):
            q(ticks, lambda nope: nope.sum(), T0, T0 + DAY)

    def test_param_type_checked_before_launch(self, ticks):
        # wrong annotation → reference-shaped error, no job runs
        from zdb_spark.query import QueryError

        def scan(price: str):
            return price.sum()

        with pytest.raises(QueryError,
                           match=r"expected parameter price to be of type "
                                 r"Vector\{Float64\}"):
            q(ticks, scan, T0, T0 + DAY)

    def test_param_type_accepted_spellings(self, ticks):
        # zdb name, numpy dtype name, and python builtin all validate
        def s1(price: "f64"):  # noqa: F821
            return float(price.sum())

        def s2(price: "float64"):  # noqa: F821
            return float(price.sum())

        def s3(price: float):
            return float(price.sum())

        for fn in (s1, s2, s3):
            assert q(ticks, fn, T0, T0 + 10 * DAY) == 36.0

    def test_ts_param_accepts_int_annotation(self, ticks):
        def scan(ts: "i64"):  # noqa: F821
            return int(len(ts))

        assert q(ticks, scan, T0, T0 + 10 * DAY) == 8

    def test_custom_combine(self, ticks):
        res = q(ticks, lambda price: float(price.max()), T0, T0 + 10 * DAY,
                combine=max)
        assert res == 8.0

    def test_ordered_fold(self, ticks):
        # stateful sequential fold — exact zdb semantics: last call's
        # return value, state via closure
        state = {"total": 0.0}

        def scan(price):
            state["total"] += float(price.sum())
            return state["total"]

        assert q(ticks, scan, T0, T0 + 10 * DAY, ordered=True) == 36.0

    def test_time_range_filters(self, ticks):
        # only day-1 rows (prices 1..4)
        assert q(ticks, lambda price: price.sum(), T0, T0 + DAY - 1) == 10.0


class TestEngine:
    def test_sql_over_registered_table(self, spark, ticks, tmp_home):
        eng = Engine(spark, home=tmp_home)
        eng.register("ticks")
        got = eng.sql("SELECT sum(price) AS s FROM ticks").collect()[0]["s"]
        assert got == 36.0

    def test_sql_join_window(self, spark, ticks, tmp_home):
        """Joins/windows — the surface zdb delegated to Julia — come from
        Catalyst directly."""
        eng = Engine(spark, home=tmp_home)
        eng.register("ticks")
        rows = eng.sql("""
            SELECT sym, price, rn FROM (
                SELECT sym, price,
                       row_number() OVER (PARTITION BY sym ORDER BY ts) AS rn
                FROM ticks
            ) WHERE rn <= 2 ORDER BY rn
        """).collect()
        assert [r["price"] for r in rows] == [1.0, 2.0]
