from pmp_analytics_spark.plans.audit import (
    assert_no_cartesian_product,
    count_exchanges,
    has_broadcast_hash_join,
    has_pushed_filters,
    has_take_ordered,
    physical_plan,
    unpartitioned_window_count,
)

__all__ = [
    "assert_no_cartesian_product",
    "count_exchanges",
    "has_broadcast_hash_join",
    "has_pushed_filters",
    "has_take_ordered",
    "physical_plan",
    "unpartitioned_window_count",
]
