"""Plan inspection helpers: assert that the physical plan is the one
you'd want at 100 TB (filters pushed to the scan, columns pruned, small
joins broadcast, no stray exchanges). Used by the perf test-suite and
during operator development (.explain-then-iterate loop).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "physical_plan",
    "count_exchanges",
    "has_broadcast_join",
    "pushed_filters",
    "read_schema_columns",
    "assert_max_exchanges",
]


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (each is a full
    data movement — the dominant cost at scale). Counts the numbered
    node entries of the formatted plan, excluding broadcast exchanges
    (those move only the small side)."""
    plan = physical_plan(df)
    # BroadcastExchange nodes print as "(n) BroadcastExchange" and are
    # intentionally not matched here
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, re.MULTILINE))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def pushed_filters(df: DataFrame) -> str:
    m = re.search(r"PushedFilters: \[(.*?)\]", physical_plan(df))
    return m.group(1) if m else ""


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column pruning check)."""
    m = re.search(r"ReadSchema: struct<(.*?)>", physical_plan(df))
    if not m:
        return []
    return [c.split(":")[0] for c in m.group(1).split(",") if c]


def assert_max_exchanges(df: DataFrame, n: int) -> None:
    got = count_exchanges(df)
    if got > n:
        raise AssertionError(
            f"plan has {got} exchanges (max {n}):\n{physical_plan(df)}"
        )
