"""Physical-plan assertions — the "is this the plan I'd want at 100 TB" gate.

The reference has no optimizer (SURVEY.md §4); Catalyst is ours, and these
helpers make its behavior testable: predicate pushdown reaching the parquet
scan, broadcast joins where a side is small, whole-stage codegen coverage,
and absence of accidental cartesian products. Used in tests/test_plans.py
so a regression that silently de-optimizes a pipeline fails CI.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> str:
    """Every fragment must appear in a PushedFilters: [...] of the scan."""
    plan = explain_str(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    for frag in fragments:
        assert frag.lower() in pushed.lower(), (
            f"filter {frag!r} not pushed to scan.\nPushed: {pushed}\n{plan[:2000]}"
        )
    return pushed


def assert_broadcast_join(df: DataFrame) -> None:
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"no broadcast join in plan:\n{plan[:2000]}"
    )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan[:2000]}"


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (bigger spans = fewer = better;
    returns the count so tests can bound Python/codegen boundaries)."""
    plan = explain_str(df)
    return len(re.findall(r"WholeStageCodegen \(\d+\)", plan))
