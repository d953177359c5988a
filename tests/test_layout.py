"""Z-order (Morton) clustered layout: key algebra against a pure-Python
reference, row preservation through the clustered write, and the data-
skipping property itself — per-file span balanced and SMALL across all
clustered dimensions, which is what lets parquet min/max stats prune
multi-dimensional predicates (operators/layout.py)."""

import pytest

from pyspark.sql import functions as F


def _py_morton(vals, bits):
    key = 0
    m = len(vals)
    for c, v in enumerate(vals):
        for j in range(bits):
            key |= ((v >> j) & 1) << (j * m + c)
    return key


class TestZorderKey:
    def test_matches_python_reference(self, spark):
        from zdb_spark.operators.layout import zorder_key

        rows = [(i, (i * 7) % 64, (i * 13) % 64) for i in range(64)]
        df = spark.createDataFrame(rows, "i long, x long, y long")
        got = {r.i: r.k for r in df.select(
            "i", zorder_key([F.col("x"), F.col("y")], bits=6)
            .alias("k")).collect()}
        for i, x, y in rows:
            assert got[i] == _py_morton([x, y], 6)

    def test_interleaving_is_locality_preserving(self, spark):
        # adjacent cells differ in few key bits: the key of (x, y) and
        # (x+1, y) must differ by less than the key range / 4 on average
        from zdb_spark.operators.layout import zorder_key

        df = spark.createDataFrame([(x, y) for x in range(16)
                                    for y in range(16)],
                                   "x long, y long")
        k = df.select("x", "y",
                      zorder_key([F.col("x"), F.col("y")], bits=4)
                      .alias("k")).collect()
        keys = {(r.x, r.y): r.k for r in k}
        assert len(set(keys.values())) == 256      # bijective on grid
        assert max(keys.values()) == 255           # compact range

    def test_validation(self, spark):
        from zdb_spark.operators.layout import zorder_key

        with pytest.raises(ValueError):
            zorder_key([], bits=8)
        with pytest.raises(ValueError):
            zorder_key([F.col("a"), F.col("b")], bits=32)  # 64 > 62


class TestScaleToGrid:
    def test_clamps_and_handles_nulls(self, spark):
        from zdb_spark.operators.layout import scale_to_grid

        df = spark.createDataFrame(
            [(0.0,), (5.0,), (10.0,), (-3.0,), (99.0,), (None,)],
            "v double")
        got = [r.c for r in df.select(
            scale_to_grid(F.col("v"), 0.0, 10.0, 4).alias("c")).collect()]
        assert got == [0, 8, 15, 0, 15, 0]

    def test_degenerate_range_collapses(self, spark):
        from zdb_spark.operators.layout import scale_to_grid

        df = spark.createDataFrame([(7.0,), (7.0,)], "v double")
        got = [r.c for r in df.select(
            scale_to_grid(F.col("v"), 7.0, 7.0, 8).alias("c")).collect()]
        assert got == [0, 0]


class TestWriteZordered:
    @pytest.fixture()
    def events(self, spark, sf_dir):
        import os

        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if ev.schema["ts"].dataType.typeName() in ("timestamp",
                                                   "timestamp_ntz"):
            ev = ev.withColumn(
                "ts", F.unix_micros(F.col("ts").cast("timestamp"))
                * F.lit(1000))
        return ev

    def test_rows_preserved_and_bounds_returned(self, spark, events,
                                                tmp_path):
        from zdb_spark.operators.layout import write_zordered

        p = str(tmp_path / "z")
        bounds = write_zordered(events, p, ["ts", "value"], bits=10,
                                n_files=8)
        assert set(bounds) == {"ts", "value"}
        back = spark.read.parquet(p)
        assert back.count() == events.count()
        assert back.exceptAll(events).count() == 0
        assert events.exceptAll(back).count() == 0

    def test_spans_balanced_vs_single_dim_sort(self, spark, events,
                                               tmp_path):
        from zdb_spark.operators.layout import (file_span_stats,
                                                write_zordered)

        z = str(tmp_path / "z")
        write_zordered(events, z, ["ts", "value"], bits=12, n_files=16)
        zs = file_span_stats(spark, z, ["ts", "value"]).collect()
        z_ts = sum(r["span_ts"] for r in zs) / len(zs)
        z_val = sum(r["span_value"] for r in zs) / len(zs)

        t = str(tmp_path / "t")
        (events.repartitionByRange(16, "ts").sortWithinPartitions("ts")
         .write.mode("overwrite").parquet(t))
        ts_rows = file_span_stats(spark, t, ["ts", "value"]).collect()
        t_val = sum(r["span_value"] for r in ts_rows) / len(ts_rows)

        # z-order: BOTH dims small (ideal sqrt(1/16) = 0.25); a pure ts
        # sort leaves the value dimension unclustered (span ~ 1)
        assert z_ts < 0.45 and z_val < 0.45, (z_ts, z_val)
        assert t_val > 0.6, t_val
        assert z_val < t_val / 2

    def test_caller_supplied_bounds_are_used(self, spark, events,
                                             tmp_path):
        from zdb_spark.operators.layout import write_zordered

        p = str(tmp_path / "z")
        fixed = {"ts": (0.0, 2e18), "value": (0.0, 1000.0)}
        out = write_zordered(events, p, ["ts", "value"], bits=8,
                             n_files=4, bounds=fixed)
        assert out == fixed
        assert spark.read.parquet(p).count() == events.count()
