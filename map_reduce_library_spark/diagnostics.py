"""Executed-plan diagnostics shared by tests and tools.

One home for the plan walker (review r11): tests/test_ann_index.py
and tools/scaling_probe.py each carried a verbatim copy, and a Spark
version bump that renames plan node classes would silently skew
whichever copy was forgotten. Package code may not import from
tests/, and tools must not either — so the walker lives here. Not
part of any query's dependency closure (no querydef references it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scan_file_counts(df: DataFrame, path_fragment: str) -> list[int]:
    """Execute ``df`` and return the numFiles metric of every parquet
    scan whose root path contains ``path_fragment`` — the AQE plan is
    walked through its materialized query stages (Broadcast/Shuffle/
    Result) and reused exchanges; the location comes from the scan's
    FileIndex root paths because toString() truncates metadata."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.executedPlan()
    out, stack = [], [plan]
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName()
        if "FileSourceScan" in name:
            roots = node.relation().location().rootPaths()
            paths = [
                roots.apply(i).toString() for i in range(roots.length())
            ]
            if any(path_fragment in p for p in paths):
                out.append(int(node.metrics().apply("numFiles").value()))
        ch = node.children()
        for i in range(ch.length()):
            stack.append(ch.apply(i))
        if name.endswith("QueryStageExec"):
            stack.append(node.plan())
        if name == "ReusedExchangeExec":
            stack.append(node.child())
    return out
