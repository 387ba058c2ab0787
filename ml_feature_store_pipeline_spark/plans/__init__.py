from .explain import (
    count_exchanges,
    executed_plan,
    formatted_plan,
    has_broadcast_join,
    has_partial_aggregation,
    has_sort_merge_join,
    pushed_filters,
    scan_read_schema,
    whole_stage_codegen_spans,
)

__all__ = [
    "executed_plan",
    "formatted_plan",
    "pushed_filters",
    "scan_read_schema",
    "has_broadcast_join",
    "has_sort_merge_join",
    "has_partial_aggregation",
    "count_exchanges",
    "whole_stage_codegen_spans",
]
