"""Physical-plan introspection helpers.

The repo encodes its 100 TB scale contracts as PLAN assertions, not just
value assertions: a filter that must reach the parquet scan, a join that
must broadcast, a pipeline that must never produce a cartesian product.
These helpers centralize the formatted-explain plumbing the tests use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (what .explain('formatted') prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def plan_lines(df: DataFrame, key: str) -> list[str]:
    """All plan lines mentioning ``key`` (e.g. 'PushedFilters',
    'ReadSchema')."""
    return [line for line in formatted_plan(df).splitlines() if key in line]


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, (
        "plan contains a cartesian/nested-loop join:\n" + plan
    )


def assert_broadcast_join(df: DataFrame) -> None:
    assert "BroadcastHashJoin" in formatted_plan(df), "expected a broadcast join"


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Every scan's PushedFilters line must contain ``fragment``."""
    pushed = plan_lines(df, "PushedFilters")
    assert pushed and all(fragment in line for line in pushed), (
        f"filter {fragment!r} not pushed to every scan: {pushed}"
    )


def assert_read_schema_excludes(df: DataFrame, column: str) -> None:
    """No scan may read ``column`` (column-pruning contract)."""
    reads = plan_lines(df, "ReadSchema")
    assert reads and all(column not in line for line in reads), (
        f"scan reads pruned column {column!r}: {reads}"
    )
