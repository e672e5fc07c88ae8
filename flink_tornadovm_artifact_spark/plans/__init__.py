"""Plan inspection helpers."""

from .inspect import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_spans,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "wholestage_codegen_spans",
]
