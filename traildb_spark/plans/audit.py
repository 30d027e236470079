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


def _balanced(text: str, start: int, open_ch: str, close_ch: str) -> str:
    r"""The substring from ``start`` (which must point at ``open_ch``) to its
    MATCHING close, inclusive. Regexes like ``[^\]]*`` truncate at the
    first close char, which corrupts nested forms — ``In(uuid, [a,b])``
    inside PushedFilters, ``array<struct<...>>`` inside ReadSchema."""
    depth = 0
    for i in range(start, len(text)):
        if text[i] == open_ch:
            depth += 1
        elif text[i] == close_ch:
            depth -= 1
            if depth == 0:
                return text[start : i + 1]
    return text[start:]


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: ", plan):
        body = _balanced(plan, m.end(), "[", "]")[1:-1].strip()
        if body:
            # split only between filter terms (a comma followed by a new
            # Filter(...) constructor), not inside EqualTo(col,val) or a
            # value list
            out.extend(t.strip() for t in re.split(r",\s*(?=[A-Z]\w*\()", body))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings of the plan's file scans (column pruning check);
    angle brackets are matched, so nested array/struct types stay whole."""
    plan = explain_str(df)
    return [
        "struct" + _balanced(plan, m.end() - 1, "<", ">")
        for m in re.finditer(r"ReadSchema: struct<", plan)
    ]


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
    """Assert no file scan reads a TOP-LEVEL column outside ``allowed``
    (nested struct member names are not column reads)."""
    for s in read_schemas(df):
        # walk only depth-1 names: "a:bigint,b:array<struct<c:int>>" → a, b
        depth = 0
        token = ""
        cols = []
        for ch in s[len("struct<") : -1]:
            if ch in "<([":
                depth += 1
            elif ch in ">)]":
                depth -= 1
            elif depth == 0 and ch == ",":
                cols.append(token)
                token = ""
                continue
            if depth == 0:
                token += ch
        if token:
            cols.append(token)
        names = [c.split(":", 1)[0].strip() for c in cols if ":" in c]
        extra = [c for c in names if c not in allowed]
        if extra:
            raise AssertionError(f"scan reads unpruned columns {extra} in {s}")
