"""Physical-plan introspection: assert that the optimizations the engine
relies on actually landed in the executed plan.

The reference engine hard-codes its optimizations into the storage layout
(partition pruning, binary-search seek, projection at open —
/root/reference/src/table/scan.rs:43-89); our engine delegates them to
Catalyst/Parquet, so the honest equivalent of "the seek code exists" is
"the plan contains PartitionFilters / PushedFilters / a pruned
ReadSchema".  These helpers make that checkable in tests and in CI — the
scale discipline SURVEY.md §4 calls for.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

__all__ = ["ScanReport", "scan_report", "assert_pushdown", "explain_str"]


@dataclass
class ScanReport:
    """What reached the Parquet scan node(s) of a plan."""

    partition_filters: list[str] = field(default_factory=list)
    pushed_filters: list[str] = field(default_factory=list)
    read_schema: str = ""
    has_partition_pruning: bool = False
    has_pushed_filters: bool = False
    codegen_stages: int = 0
    exchanges: int = 0  # shuffle boundaries in the plan


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan string (same text ``df.explain(mode)`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode)


def scan_report(df: DataFrame) -> ScanReport:
    """Parse the executed plan for scan-level optimization evidence."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    rep = ScanReport()

    # NB: plan strings truncate long metadata lists at
    # spark.sql.maxMetadataStringLength with "...", so the bracket may
    # never close — accept either terminator.
    m = re.search(r"PartitionFilters: \[([^\]\n]*?)(?:\]|\.\.\.)", plan)
    if m:
        rep.partition_filters = [s.strip() for s in m.group(1).split(",") if s.strip()]
        rep.has_partition_pruning = bool(rep.partition_filters)
    m = re.search(r"PushedFilters: \[([^\]\n]*?)(?:\]|\.\.\.)", plan)
    if m:
        rep.pushed_filters = [s.strip() for s in m.group(1).split(",") if s.strip()]
        rep.has_pushed_filters = bool(rep.pushed_filters)
    m = re.search(r"ReadSchema: (\S+)", plan)
    if m:
        rep.read_schema = m.group(1)
    rep.codegen_stages = len(re.findall(r"\*\(\d+\)", plan))
    rep.exchanges = plan.count("Exchange")
    return rep


def assert_pushdown(df: DataFrame, want_partition: bool = True,
                    want_filters: bool = True,
                    max_exchanges: int | None = None,
                    want_columns: list[str] | None = None) -> ScanReport:
    """Raise AssertionError unless the plan shows the expected pruning.

    Use in tests right after building a scan: cheap (no execution) and
    catches regressions where a filter silently stops reaching Parquet.
    """
    rep = scan_report(df)
    if want_partition and not rep.has_partition_pruning:
        raise AssertionError(f"no partition pruning in plan: {rep}")
    if want_filters and not rep.has_pushed_filters:
        raise AssertionError(f"no pushed filters in plan: {rep}")
    if max_exchanges is not None and rep.exchanges > max_exchanges:
        raise AssertionError(
            f"{rep.exchanges} shuffles (wanted <= {max_exchanges}): {rep}")
    if want_columns is not None:
        for c in want_columns:
            if c not in rep.read_schema:
                raise AssertionError(
                    f"column {c!r} missing from ReadSchema {rep.read_schema}")
    return rep
