"""Physical-plan introspection: assert the plans are the ones you'd want
at 100 TB, not just ones that pass tests at sf0.01."""

from .introspect import (
    executed_plan,
    has_broadcast_hash_join,
    has_partition_filters,
    has_pushed_filters,
    has_take_ordered,
    read_schema_columns,
    wholestage_codegen_spans,
)

__all__ = [
    "executed_plan",
    "has_broadcast_hash_join",
    "has_partition_filters",
    "has_pushed_filters",
    "has_take_ordered",
    "read_schema_columns",
    "wholestage_codegen_spans",
]
