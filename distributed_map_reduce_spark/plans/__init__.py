from .inspect import (
    count_shuffles,
    formatted_plan,
    has_broadcast_join,
    has_partial_aggregation,
    pushed_filters,
    read_schemas,
    whole_stage_codegen_subtrees,
)

__all__ = [
    "count_shuffles",
    "formatted_plan",
    "has_broadcast_join",
    "has_partial_aggregation",
    "pushed_filters",
    "read_schemas",
    "whole_stage_codegen_subtrees",
]
