"""Physical-plan inspection helpers (see ``inspect``)."""

from .inspect import (
    broadcast_join_count,
    codegen_span_count,
    exchange_count,
    forced_broadcast_hint_count,
    formatted_plan,
    plan_report,
    python_eval_count,
    pushed_filters,
    scan_read_columns,
    sort_merge_join_count,
)

__all__ = [
    "broadcast_join_count",
    "codegen_span_count",
    "exchange_count",
    "forced_broadcast_hint_count",
    "formatted_plan",
    "plan_report",
    "python_eval_count",
    "pushed_filters",
    "scan_read_columns",
    "sort_merge_join_count",
]
