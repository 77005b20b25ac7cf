from nbi_oedi_etl_spark.plans.explain import (
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    partition_filters,
    physical_plan,
    pushed_filters,
)

__all__ = [
    "count_exchanges",
    "formatted_plan",
    "has_broadcast_join",
    "partition_filters",
    "physical_plan",
    "pushed_filters",
]
