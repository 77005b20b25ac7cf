"""Time-series gap-filling: densify a per-key hourly series over the key's
own observed span and forward-fill measure values across the generated
gaps — the hypertable `time_bucket_gapfill`/`locf` semantic, Spark-first
(beyond reference scope: the reference's resample, transform.py:19-122,
silently drops empty hours; downstream ML windows need a dense grid).

Plan shape: one shuffle aggregates each key's (min, max) hour bounds and
per-hour observed aggregates TOGETHER (same grouping key, same exchange);
the dense hour grid is a codegen'd ``sequence()`` explode of the tiny
per-key bounds row; a left join re-attaches observations; a window
forward-fills. The exploded side is |keys| x |hours| rows — small next to
the fact table — and the join key (key, hour) is the aggregate's own
grouping key. At 100 TB the fact is read once; everything after the first
aggregate operates on reduced data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_gapfill_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Dense per-key hourly grid with event counts and LOCF-filled means.

    Returns (key, hour, n_events, value_mean, value_filled): n_events is 0
    on generated rows, value_mean NULL there, value_filled the last
    preceding non-null mean (NULL until the key's first observation).
    ``value_mean`` is computed from an exact DECIMAL sum so it is
    fold-order independent across engines.
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    hourly = df.groupBy(F.col(key_col).alias("key"), hour.alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        # exact decimal sum cast to double BEFORE the division: both sides
        # of the oracle compare then do one identical IEEE double divide.
        (
            F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("value_mean"),
    )
    bounds = hourly.groupBy("key").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = bounds.select(
        "key",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    filled = (
        grid.join(hourly, ["key", "hour"], "left")
        .withColumn("n_events", F.coalesce("n_events", F.lit(0)))
        .withColumn(
            "value_filled",
            F.last("value_mean", ignorenulls=True).over(
                Window.partitionBy("key")
                .orderBy("hour")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return filled.select("key", "hour", "n_events", "value_mean", "value_filled")
