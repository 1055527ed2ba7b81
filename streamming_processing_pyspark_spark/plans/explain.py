"""Physical-plan inspection helpers.

"Correct but with the wrong plan" is a scale bug: a scan that reads all
columns, a join that shuffles a dimension table, a Python eval node in a
relational pipeline. These helpers turn `.explain("formatted")` into
assertions so plan quality is tested like behavior (see tests/test_plans.py).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """The filter must reach the scan (PushedFilters), not run post-scan only."""
    plan = plan_string(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any(fragment in ln for ln in pushed), (
        f"filter {fragment!r} not pushed to scan; PushedFilters lines: {pushed}\n{plan}"
    )


def assert_read_schema_only(df: DataFrame, table_fragment: str, columns: set[str]) -> None:
    """Column pruning: the scan's ReadSchema must contain exactly `columns`."""
    plan = plan_string(df)
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Location" in ln and table_fragment in ln:
            read = next(
                (x for x in lines[i - 5 : i + 5] if "ReadSchema" in x), None
            )
            assert read is not None, f"no ReadSchema near {table_fragment}\n{plan}"
            inner = read.split("struct<", 1)[1].rsplit(">", 1)[0]
            got = {c.split(":")[0].strip() for c in inner.split(",") if c.strip()}
            assert got == columns, (
                f"scan of {table_fragment} reads {sorted(got)}, wanted {sorted(columns)}"
            )
            return
    raise AssertionError(f"no scan of {table_fragment} found in plan\n{plan}")


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    plan = plan_string(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= min_count, f"expected ≥{min_count} broadcast joins, found {n}\n{plan}"


def assert_no_python_eval(df: DataFrame) -> None:
    """Relational pipelines must stay JVM-side (no Batch/ArrowEvalPython)."""
    plan = plan_string(df)
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, f"unexpected Python eval node {node} in plan\n{plan}"


def executed_plan_string(df: DataFrame) -> str:
    """Execute the plan (AQE finalizes it) and return the executed plan."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def assert_whole_stage_codegen(df: DataFrame) -> None:
    """At least one whole-stage-codegen span in the executed plan.

    Under AQE the final plan (and its codegen spans) only exists after
    execution, so this runs the query.
    """
    plan = executed_plan_string(df)
    # executed-plan toString marks codegen spans as "*(id)"
    assert "WholeStageCodegen" in plan or "*(" in plan, (
        f"no WholeStageCodegen spans\n{plan}"
    )


def assert_partial_aggregation(df: DataFrame) -> None:
    """Map-side combine: two HashAggregate phases around the exchange."""
    plan = plan_string(df, "simple")
    assert plan.count("HashAggregate") >= 2 or "partial" in plan, (
        f"no partial aggregation phase\n{plan}"
    )


def assert_top_k_plan(df: DataFrame) -> None:
    """Global top-k must plan TakeOrderedAndProject, not a full sort."""
    plan = plan_string(df, "simple")
    assert "TakeOrderedAndProject" in plan, f"top-k planned as full sort\n{plan}"
