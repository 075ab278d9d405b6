from era_parser_spark.plans.audit import (
    broadcast_join_count,
    codegen_span_count,
    formatted_plan,
    plan_summary,
    pushed_filters,
    read_schema_columns,
    uses_take_ordered,
)

__all__ = [
    "formatted_plan",
    "plan_summary",
    "pushed_filters",
    "read_schema_columns",
    "broadcast_join_count",
    "codegen_span_count",
    "uses_take_ordered",
]
