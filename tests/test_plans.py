"""Plan-shape tests: the engine's scale guarantees asserted on physical
plans (SURVEY.md §4 — pruning/pushdown/broadcast are the whole point of
the Spark-first design).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nbi_oedi_etl_spark import workload
from nbi_oedi_etl_spark.plans import (
    count_exchanges,
    has_broadcast_join,
    physical_plan,
    pushed_filters,
)
from nbi_oedi_etl_spark.sources import read_table

from .conftest import SF_SMALL


def test_dimension_join_broadcasts(spark):
    """J1: the dim⋈fact join must broadcast the dimension side — the fact
    side must never shuffle for the join (saved-queries.sql:14 restated)."""
    df = workload.ref_q1_count_distinct(spark, SF_SMALL)
    assert has_broadcast_join(df), physical_plan(df)


def test_filter_pushdown_reaches_scan(spark):
    """P3: row predicates must reach the parquet reader."""
    li = read_table(spark, SF_SMALL, "lineitem").where(F.col("l_quantity") > 49.0)
    pf = pushed_filters(li)
    assert "l_quantity" in pf, f"filter not pushed: {pf!r}"


def test_column_pruning_reaches_scan(spark):
    """P2: a 2-column projection must not read all 11 lineitem columns."""
    li = read_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    plan = physical_plan(li)
    assert "l_extendedprice" not in plan, "unprojected column appears in scan"
    assert "ReadSchema" in plan


def test_flagship_single_shuffle(spark):
    """A1: the hourly resample is exactly ONE shuffle (the entity×hour
    aggregation); partial aggregation must be map-side."""
    df = workload.flagship_hourly_resample(spark, SF_SMALL)
    assert count_exchanges(df) == 1, physical_plan(df)
    assert "partial" in physical_plan(df).lower() or "HashAggregate" in physical_plan(df)


def test_topk_orders_avoids_global_sort(spark):
    """O1: sort+limit must plan TakeOrderedAndProject, not a full sort."""
    df = workload.topk_orders(spark, SF_SMALL)
    assert "TakeOrderedAndProject" in physical_plan(df), physical_plan(df)


def test_window_topk_uses_group_limit(spark):
    """W1: rn<=k must trigger WindowGroupLimit (partial top-k below the
    shuffle, Spark ≥3.5)."""
    df = workload.ref_q3_topk_per_group(spark, SF_SMALL)
    assert "WindowGroupLimit" in physical_plan(df), physical_plan(df)
