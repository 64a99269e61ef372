"""Physical-plan inspection helpers (SURVEY.md §4).

The optimizer section of the survey is mostly "Catalyst does it for free" —
these helpers make that checkable: tests assert that pushdown, pruning,
broadcast and codegen actually appear in the executed plan rather than
trusting that they should.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (spark 3+ explain format)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan advertises a pushed filter containing
    ``fragment`` (e.g. "GreaterThan(l_quantity,40.0")."""
    plan = formatted_plan(df)
    return "PushedFilters" in plan and fragment in plan


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names inside the scan's ReadSchema (column-pruning witness)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(f.split(":")[0].strip() for f in inner.split(",") if ":" in f)
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider/fewer is better."""
    plan = formatted_plan(df)
    return plan.count("WholeStageCodegen")
