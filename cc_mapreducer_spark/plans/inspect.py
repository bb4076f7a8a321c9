"""Plan-inspection helpers used by tests and the bench lane to assert the
physical plan is the one we want (pushdown reached the scan, the join
broadcast, no surplus Exchange) — not just that results are correct."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the physical plan (broadcasts excluded).

    Counts only the formatted plan's detail headers ("(n) Exchange") so the
    tree rendering doesn't double-count each node."""
    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().split(" ", 1)[-1] == "Exchange" and line.strip().startswith("(")
    )


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE) physical plan; runs the query. Codegen spans show
    up as '*(n)' markers only once AQE has finalized the plan."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]
