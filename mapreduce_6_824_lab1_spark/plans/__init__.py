from mapreduce_6_824_lab1_spark.plans.inspect import (
    formatted_plan,
    has_broadcast_hash_join,
    pushed_filters,
)

__all__ = ["formatted_plan", "has_broadcast_hash_join", "pushed_filters"]
