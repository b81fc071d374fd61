"""Physical-plan assertions — the "is this the plan I'd want at 100 TB" checks.

Used by tests to pin scale-critical plan properties:
  - filters/projections reach the parquet scan (PushedFilters / ReadSchema)
  - small dimension joins broadcast (BroadcastHashJoin)
  - no accidental cartesian products
  - whole-stage codegen spans the relational stages
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = formatted_plan(df)
    assert "PushedFilters" in plan, "no parquet scan with pushdown in plan"
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any(fragment in ln for ln in pushed), (
        f"filter '{fragment}' not pushed to scan; pushed lines: {pushed}")


def assert_read_schema_excludes(df: DataFrame, column: str) -> None:
    plan = formatted_plan(df)
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert reads, "no ReadSchema in plan"
    assert all(column not in ln for ln in reads), (
        f"column '{column}' is read but should be pruned; {reads}")


def assert_broadcast_join(df: DataFrame) -> None:
    plan = simple_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        "expected a broadcast join in plan")


def assert_no_cartesian(df: DataFrame) -> None:
    plan = simple_plan(df)
    assert "CartesianProduct" not in plan, "cartesian product in plan"


def count_codegen_stages(df: DataFrame) -> int:
    plan = simple_plan(df)
    return plan.count("WholeStageCodegen")
