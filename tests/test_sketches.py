"""Approximate-aggregate (sketch) accuracy tests: HyperLogLog distinct
counts and t-digest-style quantiles must land within their documented
error bounds against exact answers on the driver testdata — the sketches
are the 100 TB substitutes for exact distinct/percentile."""

import os

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).cache()


class TestApproxCountDistinct:
    def test_within_default_rsd(self, lineitem):
        exact, approx = lineitem.agg(
            F.countDistinct("l_partkey").alias("e"),
            F.approx_count_distinct("l_partkey").alias("a")).collect()[0]
        assert abs(approx - exact) / exact < 0.05  # default rsd 0.05 ≈ 2σ

    def test_tighter_rsd(self, lineitem):
        exact, approx = lineitem.agg(
            F.countDistinct("l_orderkey").alias("e"),
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("a")
        ).collect()[0]
        assert abs(approx - exact) / exact < 0.03


class TestApproxQuantile:
    def test_median_close_to_exact(self, lineitem):
        exact = lineitem.agg(
            F.expr("percentile(l_extendedprice, 0.5)")).collect()[0][0]
        (approx,) = lineitem.stat.approxQuantile(
            "l_extendedprice", [0.5], 0.01)
        lo = lineitem.agg(
            F.expr("percentile(l_extendedprice, 0.49)")).collect()[0][0]
        hi = lineitem.agg(
            F.expr("percentile(l_extendedprice, 0.51)")).collect()[0][0]
        assert lo <= approx <= hi, (exact, approx)

    def test_zero_error_is_exact(self, lineitem):
        # relativeError=0 must agree with the exact interpolation's
        # neighborhood (approxQuantile returns an actual data point)
        (approx,) = lineitem.stat.approxQuantile("l_quantity", [0.5], 0.0)
        exact = lineitem.agg(
            F.expr("percentile_approx(l_quantity, 0.5, 2147483647)")
        ).collect()[0][0]
        assert approx == exact
