"""Physical-plan auditing: make scale properties testable.

The reference's performance contract is structural (inverted-index pruning,
fused filter+decode, O(1) lookups — SURVEY §4). On Spark the analogous
contract is "the optimizer actually did the thing": filters reached the
Parquet scan, the scan schema is pruned, small dims broadcast, the operator
introduced no more shuffles than designed. These helpers turn each property
into an assertion so tests fail when a plan regresses.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain(mode)`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        body = m.group(1).strip()
        if body:
            # split only between filter terms (a comma followed by a new
            # Filter(...) constructor), not inside EqualTo(col,val)
            out.extend(t.strip() for t in re.split(r",\s*(?=[A-Z]\w*\()", body))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings of the plan's file scans (column pruning check)."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", explain_str(df))


def num_shuffles(df: DataFrame) -> int:
    """Count of shuffle exchanges in the physical plan."""
    plan = explain_str(df, "simple")
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)", plan))


def num_broadcast_joins(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", explain_str(df, "simple")))


def assert_pushed(df: DataFrame, *fragments: str) -> None:
    """Assert every fragment appears in some pushed filter."""
    pf = " | ".join(pushed_filters(df))
    missing = [f for f in fragments if f not in pf]
    if missing:
        raise AssertionError(f"filters not pushed to scan: {missing}; got [{pf}]")


def assert_schema_pruned(df: DataFrame, allowed: set[str]) -> None:
    """Assert no file scan reads a column outside ``allowed``."""
    for s in read_schemas(df):
        cols = re.findall(r"(\w+):", s)
        extra = [c for c in cols if c not in allowed]
        if extra:
            raise AssertionError(f"scan reads unpruned columns {extra} in {s}")
