"""Plan inspection helpers — assert the physical plan is the one we
designed for scale (SURVEY §4): filters reach the scan, small dims
broadcast, aggregates partial-aggregate before the shuffle.

Used by tests/test_plans.py and handy interactively:

    from spark_dynamodb_spark.plans import explain_str, assert_pushed_filters
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in a PushedFilters list of the scan."""
    plan = explain_str(df)
    pushed_lines = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed_lines, f"no PushedFilters in plan:\n{plan}"
    joined = "\n".join(pushed_lines)
    for frag in fragments:
        assert frag in joined, f"filter {frag!r} not pushed; got: {joined}"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan, f"no broadcast join in plan:\n{plan}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def assert_no_broadcast_hint(df: DataFrame) -> None:
    """No HARD broadcast hint anywhere in the logical plan — unbounded
    relations (candidate sets, per-doc stats) must leave the build-side
    choice to AQE, which broadcasts only under the size threshold
    (VERDICT r1: a hot corpus can push a 'small' side past broadcast
    limits; the hint would then OOM the driver at 100 TB)."""
    analyzed = df._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed, (
        f"hard broadcast hint in logical plan:\n{analyzed}"
    )


def assert_partial_aggregate(df: DataFrame) -> None:
    """Two-phase (map-side combined) hash aggregation."""
    plan = explain_str(df)
    assert "partial_" in plan or "HashAggregate" in plan, plan


def assert_read_schema_pruned(df: DataFrame, max_columns: int) -> None:
    """The parquet ReadSchema must carry at most max_columns fields."""
    plan = explain_str(df)
    for ln in plan.splitlines():
        if "ReadSchema" in ln:
            struct = ln.split("struct<", 1)[-1]
            n = struct.count(":")
            assert n <= max_columns, f"scan reads {n} columns (> {max_columns}): {ln}"
            return
    raise AssertionError(f"no ReadSchema in plan:\n{plan}")
