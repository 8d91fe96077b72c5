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
    """PushedFilters entries of every parquet scan in the plan.

    Paren-aware split: a filter's own rendering contains commas
    (``GreaterThan(x,3)``, ``In(y, [2,4])``) — a naive comma split would
    shred each filter into bogus fragments."""
    out: list[str] = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            body = line.split(":", 1)[1].strip().strip("[]")
            depth, cur = 0, []
            for ch in body:
                if ch == "," and depth == 0:
                    if "".join(cur).strip():
                        out.append("".join(cur).strip())
                    cur = []
                    continue
                depth += ch in "(["
                depth -= ch in ")]"
                cur.append(ch)
            if "".join(cur).strip():
                out.append("".join(cur).strip())
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
    """Join operators in the physical plan, in plan order, ONE entry per
    join.

    Counts only the numbered operator headers ("(5) BroadcastHashJoin")
    of the formatted output — the tree rendering repeats every operator,
    so matching both double-counted joins (and joins on ':-' branches
    inconsistently), breaking any cardinality assertion.
    """
    import re

    names = (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    )
    found = []
    for line in formatted_plan(df).splitlines():
        m = re.match(r"^\(\d+\) (\w+)", line.strip())
        if m:
            for n in names:
                if m.group(1) == n:
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
