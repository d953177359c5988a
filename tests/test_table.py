"""Table-layer tests: create/open lifecycle, append + out-of-order
enforcement, partition-pruned scan with projection, symbols endpoint —
the §1/§2.1/§2.2 invariants re-expressed on Parquet."""

import pytest

from pyspark.sql import Row

from zdb_spark.schema import ColumnType, PartitionBy, Schema
from zdb_spark.table import (OutOfOrderError, Table, TableExistsError,
                             TableNotFoundError)

NS = 1_000_000_000
DAY = 86_400 * NS
T0 = 1704067200 * NS  # 2024-01-01T00:00:00Z


def make_schema(name="t1"):
    # ts is auto-injected as column 0 (zdb hard invariant #1)
    return (Schema(name)
            .add_col("sym", ColumnType.SYMBOL16)
            .add_col("price", ColumnType.F64)
            .add_col("size", ColumnType.U32)
            .with_partition_by(PartitionBy.DAY))


def rows_df(spark, ts_list, sym="AAPL", price=1.0, size=10):
    return spark.createDataFrame(
        [Row(ts=t, sym=sym, price=price + i, size=size)
         for i, t in enumerate(ts_list)])


class TestLifecycle:
    def test_create_open_roundtrip(self, spark, tmp_home):
        t = Table.create(spark, make_schema(), home=tmp_home)
        assert t.row_count == 0
        t2 = Table.open(spark, "t1", home=tmp_home)
        assert [c.name for c in t2.schema.columns] == ["ts", "sym", "price", "size"]

    def test_create_twice_fails(self, spark, tmp_home):
        Table.create(spark, make_schema(), home=tmp_home)
        with pytest.raises(TableExistsError):
            Table.create(spark, make_schema(), home=tmp_home)

    def test_open_missing_fails(self, spark, tmp_home):
        with pytest.raises(TableNotFoundError):
            Table.open(spark, "nope", home=tmp_home)

    def test_create_or_open(self, spark, tmp_home):
        Table.create_or_open(spark, make_schema(), home=tmp_home)
        Table.create_or_open(spark, make_schema(), home=tmp_home)  # no raise


class TestWrite:
    def test_append_updates_meta(self, spark, tmp_home):
        t = Table.create(spark, make_schema(), home=tmp_home)
        n = t.write(rows_df(spark, [T0, T0 + 1, T0 + DAY]))
        assert n == 3
        assert t.row_count == 3
        assert t.get_first_ts() == T0
        assert t.get_last_ts() == T0 + DAY

    def test_out_of_order_raises(self, spark, tmp_home):
        t = Table.create(spark, make_schema(), home=tmp_home)
        t.write(rows_df(spark, [T0 + DAY]))
        with pytest.raises(OutOfOrderError, match="out of order"):
            t.write(rows_df(spark, [T0]))

    def test_out_of_order_override(self, spark, tmp_home):
        t = Table.create(spark, make_schema(), home=tmp_home)
        t.write(rows_df(spark, [T0 + DAY]))
        assert t.write(rows_df(spark, [T0]), enforce_order=False) == 1

    def test_missing_column_raises(self, spark, tmp_home):
        t = Table.create(spark, make_schema(), home=tmp_home)
        bad = spark.createDataFrame([Row(ts=T0, sym="A")])
        with pytest.raises(ValueError, match="missing columns"):
            t.write(bad)


class TestScan:
    def test_time_range_inclusive(self, spark, tmp_home):
        t = Table.create(spark, make_schema(), home=tmp_home)
        t.write(rows_df(spark, [T0 + i * DAY for i in range(5)]))
        got = t.scan(T0 + DAY, T0 + 3 * DAY).select("ts").collect()
        assert sorted(r["ts"] for r in got) == [T0 + DAY, T0 + 2 * DAY,
                                                T0 + 3 * DAY]

    def test_projection(self, spark, tmp_home):
        t = Table.create(spark, make_schema(), home=tmp_home)
        t.write(rows_df(spark, [T0]))
        df = t.scan(columns=["ts", "price"])
        assert df.columns == ["ts", "price"]

    def test_unknown_column_raises(self, spark, tmp_home):
        t = Table.create(spark, make_schema(), home=tmp_home)
        t.write(rows_df(spark, [T0]))
        with pytest.raises(KeyError):
            t.scan(columns=["nope"])

    def test_partition_pruning_in_plan(self, spark, tmp_home):
        """The dual predicate rewrite must reach the scan: partition
        filters on dt AND pushed filters on ts."""
        t = Table.create(spark, make_schema(), home=tmp_home)
        t.write(rows_df(spark, [T0 + i * DAY for i in range(5)]))
        plan = t.scan(T0 + DAY, T0 + 2 * DAY)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "dt" in plan

    def test_empty_table_scan(self, spark, tmp_home):
        t = Table.create(spark, make_schema(), home=tmp_home)
        assert t.scan(T0, T0 + DAY).count() == 0


class TestSymbols:
    def test_distinct_sorted(self, spark, tmp_home):
        t = Table.create(spark, make_schema(), home=tmp_home)
        df = spark.createDataFrame(
            [Row(ts=T0 + i, sym=s, price=1.0, size=1)
             for i, s in enumerate(["MSFT", "AAPL", "MSFT", "GOOG"])])
        t.write(df)
        assert t.symbols("sym") == ["AAPL", "GOOG", "MSFT"]

    def test_non_symbol_column_rejected(self, spark, tmp_home):
        t = Table.create(spark, make_schema(), home=tmp_home)
        with pytest.raises(ValueError, match="not a symbol"):
            t.symbols("price")
