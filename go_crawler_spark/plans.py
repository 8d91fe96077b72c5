"""Physical-plan inspection helpers: verify pushdown/pruning/codegen.

The engine relies on Catalyst for predicate pushdown, column pruning, and
whole-stage codegen rather than implementing any of it (SURVEY.md §4).
These helpers make that reliance testable: tests assert that the plans we
ship actually exhibit the properties we claim (PushedFilters reaching the
parquet scan, pruned ReadSchema, codegen spans, broadcast vs shuffle
joins) instead of trusting that they do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    out: list[str] = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            body = line.split(":", 1)[1].strip().strip("[]")
            out.extend(p.strip() for p in body.split(",") if p.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each scan (pruning check)."""
    import re

    scans: list[list[str]] = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            cols = re.findall(r"(\w+):", line.split(":", 1)[1])
            scans.append(cols)
    return scans


def has_codegen(df: DataFrame) -> bool:
    # formatted mode labels fused operators "[codegen id : N]" (simple
    # mode shows "WholeStageCodegen") — accept either.
    plan = formatted_plan(df)
    return "[codegen id" in plan or "WholeStageCodegen" in plan


def join_strategies(df: DataFrame) -> list[str]:
    """Join operators appearing in the physical plan, in order."""
    names = (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    )
    plan = formatted_plan(df)
    found = []
    for line in plan.splitlines():
        for n in names:
            if n in line and line.strip().startswith(("*", "+", "(", n)):
                found.append(n)
                break
    return found


def shuffle_count(df: DataFrame) -> int:
    """Number of exchanges (shuffles) in the physical plan.

    Counts only the numbered operator headers ("(5) Exchange"), not the
    tree rendering, and excludes broadcast/reused exchanges.
    """
    import re

    return sum(
        1
        for line in formatted_plan(df).splitlines()
        if re.match(r"^\(\d+\) Exchange\b", line.strip())
    )
