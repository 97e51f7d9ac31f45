from sparkml_spark.plans.explain import (  # noqa: F401
    formatted_plan,
    has_broadcast_join,
    has_partial_aggregate,
    has_take_ordered,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
)
