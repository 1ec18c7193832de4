"""Physical-plan introspection helpers.

The engine's scale story rests on specific Catalyst behaviors —
filters reaching the parquet scan, small sides broadcast, top-K
compiling to TakeOrderedAndProject, cell filters becoming partition
pruning.  These helpers turn those properties into assertions so
tests/test_plans.py locks the *plan shape*, not just the results
(a correct result from a wrong plan is a 100x regression waiting for
scale).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_take_ordered(df: DataFrame) -> bool:
    """ORDER BY + LIMIT fused into per-partition heaps (no global sort)."""
    return "TakeOrderedAndProject" in executed_plan(df)


def has_broadcast_join(df: DataFrame) -> bool:
    p = executed_plan(df)
    return "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def has_pushed_filter(df: DataFrame, column: str) -> bool:
    """The data filter reached the parquet reader (PushedFilters)."""
    p = executed_plan(df)
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", p):
        if column in m.group(1):
            return True
    return False


def has_partition_filter(df: DataFrame, column: str) -> bool:
    """The filter prunes at the file listing (PartitionFilters)."""
    p = executed_plan(df)
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", p):
        if column in m.group(1):
            return True
    return False


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = fewer interpreter
    boundaries; 0 means something knocked the plan out of codegen).

    In executedPlan().toString() codegen'd operators are prefixed
    ``*(n)``; formatted-mode shows ``WholeStageCodegen (n)``.  Count
    both spellings."""
    p = executed_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", p))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", p))
    return len(ids)
