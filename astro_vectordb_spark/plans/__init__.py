from astro_vectordb_spark.plans.explain import (
    executed_plan,
    has_broadcast_join,
    has_partition_filter,
    has_pushed_filter,
    has_take_ordered,
    whole_stage_codegen_spans,
)

__all__ = [
    "executed_plan",
    "has_broadcast_join",
    "has_partition_filter",
    "has_pushed_filter",
    "has_take_ordered",
    "whole_stage_codegen_spans",
]
