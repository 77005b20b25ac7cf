"""Physical-plan inspection helpers.

The engine's scale guarantees are properties of the PLAN, not the code:
partition pruning must reach the file index, predicates must reach the
parquet scan, dimension joins must broadcast, and shuffles must be the ones
we budgeted for. These helpers make those properties assertable in tests
(the reference has no analog — its 'plan' is hardcoded pipeline wiring,
SURVEY.md §4).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (physical) plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def _mode(df: DataFrame, mode: str):
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    """explain(mode) output as a string."""
    return df._jdf.queryExecution().explainString(_mode(df, mode))


def partition_filters(df: DataFrame) -> str:
    """The PartitionFilters clause(s) of the scan node(s).

    NOTE: scan-node metadata is truncated at render time by
    spark.sql.maxMetadataStringLength, and the string is baked into the
    scan node when the plan materializes — so the widened value must be in
    effect BEFORE the query is built (get_spark sets it)."""
    plan = physical_plan(df)
    return "\n".join(re.findall(r"PartitionFilters: \[[^\]]*\]", plan))


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters clause(s) of the scan node(s) — predicates that
    reached the parquet reader (row-group/page pruning). See the
    truncation note on partition_filters."""
    plan = physical_plan(df)
    return "\n".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (broadcast exchanges not
    counted — they move only the small side)."""
    plan = physical_plan(df)
    return len(re.findall(r"\bExchange (?!SinglePartition)hashpartitioning|\bExchange rangepartitioning|\bExchange RoundRobinPartitioning", plan))
