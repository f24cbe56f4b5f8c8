"""Physical-plan introspection helpers.

The 100 TB design contract is checked against the plans Catalyst
actually emits (tests/test_plans.py): filters must reach the scan,
small dimensions must broadcast, hot paths must stay in whole-stage
codegen, partition layouts must prune. These helpers make those
assertions readable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what df.explain() prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every scan node in the plan."""
    out = []
    for line in plan_string(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            body = line.split(":", 1)[1].strip().strip("[]")
            out.extend(f.strip() for f in body.split(",") if f.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (column pruning)."""
    import re

    cols: list[str] = []
    for line in plan_string(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            cols.extend(re.findall(r"(\w+):", line.split(":", 1)[1]))
    return cols


def has_node(df: DataFrame, node: str) -> bool:
    """Whether the physical plan contains an operator (e.g.
    'BroadcastHashJoin', 'TakeOrderedAndProject', 'Exchange')."""
    return node in plan_string(df)


def python_eval_nodes(df: DataFrame) -> list[str]:
    """Python-evaluation operators in the plan — empty means the whole
    query runs JVM-side."""
    return [
        n
        for n in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas")
        if n in plan_string(df)
    ]


def codegen_fraction(df: DataFrame) -> float:
    """Fraction of plan operators inside whole-stage codegen (marked
    '*' in formatted mode) — a quick 'how JVM-hot is this plan' gauge."""
    ops = stars = 0
    for line in plan_string(df).splitlines():
        s = line.strip()
        if s.startswith(("+-", ":-")) or (s and s[0] == "*"):
            ops += 1
            if "* " in s.split("(")[0] or s.startswith("*"):
                stars += 1
    return stars / ops if ops else 0.0
