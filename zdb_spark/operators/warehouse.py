"""Relational warehouse report operators — the §2.7 native-surface
queries as PUBLIC operator functions.

These started life inline in the driver gates (tpch_q3 / tpch_q5 /
window_running / udf_fold_sum); round 16 hoists them here VERBATIM so
the ``warehouse_report`` composite can execute the exact code each
singleton gate verifies (the _COVERS honesty contract,
tests/test_registry.py — the same hoist r15 did for ``twap``).
Reference surface: the §2.7 relational queries a tick store's SQL
layer answers (clickingbuttons/zdb exposes scans + aggregation; the
join/window/top-k shapes are the standard warehouse extension every
SURVEY §2.7 gate pins).

Plan shapes (the 100 TB reading):

- ``tpch_q3_frame``: two selective fact filters reach the parquet
  scans (dates push down), the small filtered-dimension side is
  BROADCAST, and the top-10 is a partial TakeOrdered — no global sort.
- ``tpch_q5_frame``: one fact shuffle on l_orderkey; every dimension
  side broadcasts, so adding joins adds no exchanges.
- ``running_orders``: one hash-partitioned window on o_custkey —
  the shuffle is unavoidable (per-key ordering) and keys are ~even.
- ``pandas_fold_sum``: the §2.5 /q contract — Arrow-batched PARTIAL
  fold per input split (map-side combine in pandas), Spark-side final
  merge; the shuffle carries |keys| × n_splits rows, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["pandas_fold_sum", "pricing_summary_frame",
           "running_orders", "tpch_q3_frame", "tpch_q5_frame"]


def pricing_summary_frame(lineitem: DataFrame, *,
                          cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy aggregation — the ship-date
    filter reaches the parquet scan; everything else is one even
    two-key shuffle with full map-side partials.  Output:
    (l_returnflag, l_linestatus, sum_qty, sum_base_price,
    sum_disc_price, avg_qty, avg_disc, count_order)."""
    return (lineitem
            .where(F.col("l_shipdate")
                   <= F.lit(cutoff).cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 4)
                  .alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                  .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order")))


def tpch_q3_frame(customer: DataFrame, orders: DataFrame,
                  lineitem: DataFrame, *, segment: str = "BUILDING",
                  cutoff: str = "1995-03-15",
                  top: int = 10) -> DataFrame:
    """TPC-H Q3 shape: shipping-priority top-``top`` revenue
    (3-way join + agg + top-k).  Output: (l_orderkey, orderdate,
    o_orderpriority, revenue) ordered by revenue desc."""
    c = customer.where(F.col("c_mktsegment") == segment)
    o = orders.where(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
    li = lineitem.where(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("l_orderkey",
                     F.date_format("o_orderdate", "yyyy-MM-dd")
                      .alias("orderdate"),
                     "o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                  .alias("revenue"))
            .orderBy(F.desc("revenue"), "orderdate", "l_orderkey")
            .limit(top))


def tpch_q5_frame(region: DataFrame, nation: DataFrame,
                  customer: DataFrame, supplier: DataFrame,
                  orders: DataFrame, lineitem: DataFrame, *,
                  region_name: str = "ASIA",
                  date_lo: str = "1996-01-01",
                  date_hi: str = "1997-01-01") -> DataFrame:
    """TPC-H Q5 shape: local-supplier revenue per nation in one
    region.  Output: (n_name, revenue)."""
    r = region.where(F.col("r_name") == region_name)
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp")))
    return (lineitem.join(o, lineitem.l_orderkey == o.o_orderkey)
            .join(F.broadcast(supplier),
                  lineitem.l_suppkey == supplier.s_suppkey)
            .join(F.broadcast(customer),
                  (o.o_custkey == customer.c_custkey)
                  & (customer.c_nationkey == supplier.s_nationkey))
            .join(F.broadcast(nation),
                  supplier.s_nationkey == nation.n_nationkey)
            .join(F.broadcast(r),
                  nation.n_regionkey == r.r_regionkey)
            .groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                  .alias("revenue")))


def running_orders(orders: DataFrame, *, first: int = 3) -> DataFrame:
    """Per-customer order sequence + running revenue, first ``first``
    orders.  Output: (o_custkey, o_orderkey, order_seq,
    running_spend)."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate",
                                                "o_orderkey")
    return (orders.withColumn("order_seq", F.row_number().over(w))
            .withColumn("running_spend",
                        F.round(F.sum("o_totalprice").over(w), 4))
            .where(F.col("order_seq") <= first)
            .select("o_custkey", "o_orderkey", "order_seq",
                    "running_spend"))


def pandas_fold_sum(df: DataFrame, key: str, value: str,
                    out: str = "sum_qty") -> DataFrame:
    """§2.5 /q semantics: pandas PARTIAL fold over Arrow batches +
    Spark-side FINAL combine (the partial+final aggregation contract
    of the reference's user-defined scan, src/server.zig /q).  Output:
    (key, out) with ``out`` rounded to 4 dp."""
    import pandas as pd

    src = df.select(key, value)

    def partial(batches):
        for pdf in batches:
            yield (pdf.groupby(key, as_index=False)[value]
                   .sum().rename(columns={value: "partial_v"}))

    partials = src.mapInPandas(partial,
                               f"{key} string, partial_v double")
    return (partials.groupBy(key)
            .agg(F.round(F.sum("partial_v"), 4).alias(out)))
