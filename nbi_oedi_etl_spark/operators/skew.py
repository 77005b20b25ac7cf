"""Skew-handling operators — the 100 TB posture for hot keys
(SURVEY.md §7.4.9, §4 'salting for skewed states').

AQE's skew-join splitting handles most cases automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py). These
operators cover the aggregation-side cases AQE doesn't:

- **salted two-phase aggregation**: a grouped agg where one key holds a
  huge share of rows (e.g. state=CA in the reference's lake) bottlenecks
  one reducer. Salting splits each key into N subkeys for a partial agg,
  then combines — two small shuffles instead of one stuck task.
- **salted broadcast join**: replicate the small side N× with salt ids so
  a skewed large side spreads across N tasks per hot key (only needed
  when the join must shuffle; broadcast joins don't skew).

Only algebraic aggregates (sum/count/min/max → avg) can be two-phased;
count-distinct needs the exact dual-shuffle Spark already plans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_grouped_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    salt_buckets: int = 16,
    count_alias: str = "n_rows",
) -> DataFrame:
    """Two-phase grouped sum+count immune to key skew.

    Phase 1 groups by (keys…, salt) — hot keys split across
    ``salt_buckets`` reducers; phase 2 combines the partials by key alone
    (at most ``salt_buckets`` rows per key — trivially small).

    The salt is random-per-row but the RESULT is exact and deterministic:
    sums/counts are salt-invariant.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    phase1 = (
        df.select(*[F.col(f"`{c}`") for c in group_cols], salt, *[F.col(f"`{c}`") for c in sum_cols])
        .groupBy(*[F.col(f"`{c}`") for c in group_cols], F.col("__salt"))
        .agg(
            *[F.sum(F.col(f"`{c}`")).alias(f"__s_{c}") for c in sum_cols],
            F.count(F.lit(1)).alias("__n"),
        )
    )
    return phase1.groupBy(*[F.col(f"`{c}`") for c in group_cols]).agg(
        *[F.sum(F.col(f"__s_{c}")).alias(f"{c}_sum") for c in sum_cols],
        F.sum("__n").alias(count_alias),
    )


def salted_join_small_side(
    large: DataFrame,
    small: DataFrame,
    on_large: str,
    on_small: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Shuffle join with the small side replicated per salt bucket so a hot
    key in ``large`` spreads over ``salt_buckets`` tasks.

    Prefer ``F.broadcast(small)`` when it fits; this exists for the case
    where neither side broadcasts but one has hot keys."""
    salted_large = large.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salt_ids = small.sparkSession.range(salt_buckets).select(
        F.col("id").cast("int").alias("__salt")
    )
    salted_small = small.crossJoin(F.broadcast(salt_ids))
    cond = (salted_large[on_large] == salted_small[on_small]) & (
        salted_large["__salt"] == salted_small["__salt"]
    )
    return salted_large.join(salted_small, cond).drop("__salt")
