from hedera_spark.plans.audit import (
    executed_plan,
    formatted_plan,
    has_broadcast_join,
    has_python_eval,
    pushed_filters,
    read_schema,
)

__all__ = [
    "executed_plan",
    "formatted_plan",
    "has_broadcast_join",
    "has_python_eval",
    "pushed_filters",
    "read_schema",
]
