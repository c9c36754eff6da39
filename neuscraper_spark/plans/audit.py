"""Physical-plan auditing helpers.

Used by tests/test_plans.py and interactively while tuning: after an
operator works, ``audit_plan(df)`` summarizes whether the plan is the
one you'd *want* — pushdown reached the scan, joins broadcast, shuffle
and python-stage counts bounded, codegen spans present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_of(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit_plan(df: DataFrame) -> dict:
    plan = plan_of(df)
    return {
        "exchanges": plan.count("Exchange"),
        "python_stages": plan.count("MapInPandas")
        + plan.count("ArrowEvalPython")
        + plan.count("BatchEvalPython"),
        "row_at_a_time_python": plan.count("BatchEvalPython"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "whole_stage_codegen": "*(" in plan,
        "global_sorts": plan.count("Sort ["),
    }
