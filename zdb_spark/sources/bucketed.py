"""Bucketed tables: co-located fact-fact joins with ZERO join-key shuffle.

The reference co-locates by construction — one process, one disk layout
(/root/reference/src/table/write.rs:88-93 stripes partitions across local
dirs).  The distributed analogue is hash-bucketing: write both fact
tables bucketed by the join key into the session catalog
(``bucketBy(n, key).sortBy(key).saveAsTable``); Catalyst then proves the
two scans share a partitioning and plans a SortMergeJoin with NO Exchange
on either side.

This is the remaining 100-TB join story beyond broadcast dims: a
lineitem⋈orders join at scale shuffles BOTH fact tables on every query
unless they're bucketed; bucketing pays that shuffle once at write time
and amortizes it over every subsequent join, aggregation, or dedup on the
same key.  (``tests/test_plans_sources.py`` pins the zero-Exchange plan.)

Bucket-count guidance at 100 TB: pick ``n_buckets`` so one bucket of the
LARGER table is ~128-512 MB (e.g. 50 TB table → 100k-400k buckets);
both tables MUST use the same count for the Exchange elision to apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["save_bucketed", "bucketed_join"]


def save_bucketed(df: DataFrame, name: str, key: str | list[str],
                  n_buckets: int = 32,
                  sort_by: str | list[str] | None = None,
                  path: str | None = None) -> None:
    """Write ``df`` into the session catalog bucketed (and bucket-sorted)
    by the join key.

    ``sortBy`` inside each bucket file lets the SortMergeJoin skip its
    per-partition sort as well (plan shows no Sort above the scan when
    the bucket sort matches the join key).

    ``path`` makes it an EXTERNAL table at that location (the data
    outlives the in-memory catalog; re-registering after a session
    restart is this same call).  Default is a managed table under the
    session warehouse dir.
    """
    keys = [key] if isinstance(key, str) else list(key)
    sort_cols = ([sort_by] if isinstance(sort_by, str)
                 else list(sort_by or keys))
    w = (df.write.mode("overwrite").format("parquet")
           .bucketBy(n_buckets, *keys).sortBy(*sort_cols))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def bucketed_join(spark: SparkSession, left_name: str, right_name: str,
                  on: str | list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables on the bucket key.

    With matching bucket specs Catalyst elides BOTH Exchanges; the plan
    contains no shuffle on the join key (assert via
    ``plans.inspect.scan_report(df).exchanges``).
    """
    return spark.table(left_name).join(spark.table(right_name), on, how)
