"""As-of and range joins (SURVEY.md §2.3: absent in the reference — the
engine exposes them as first-class operators, per the 'not present' list).

As-of join strategy (the scalable union+window formulation):
tag left/right rows, UNION them on the entity key, sort within entity by
(ts, side), and carry the most recent right-side payload forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window. One
shuffle on the entity key — never a per-row range probe, never a broadcast
of the full right side. This is how as-of joins stay linear at 100 TB
(an O(n·m) theta-join would explode; Spark has no native ASOF).

Range join: a plain join with a range predicate; Spark plans an equi-join
on the key with the range as a post-filter, so it stays a hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts (direction='backward'), per ``on`` key.

    Output: all left columns + ``<payload>_asof`` for each payload column
    (+ ``asof_ts`` — the matched right timestamp; null when no match).

    Tie semantics: a right row AT the left timestamp matches (like
    merge_asof with allow_exact_matches). Among multiple right rows with
    the SAME (key, ts) the winner is engine-defined (sort stability) —
    the same contract as pandas merge_asof (input order) and DuckDB ASOF
    (unspecified); deduplicate the right side first if it matters.
    """
    if direction != "backward":
        raise ValueError("only direction='backward' is implemented")
    lcols = left.columns
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias("__r_ts"),
        *[F.lit(None).cast(dict(right.dtypes)[p]).alias(f"__p_{p}") for p in right_payload],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c != on],
        F.col(on),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        F.col(right_ts).alias("__r_ts"),
        *[F.col(p).alias(f"__p_{p}") for p in right_payload],
    ).select(*lcols, "__side", "__ts", "__r_ts", *[f"__p_{p}" for p in right_payload])

    unioned = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at equal ts (side 0 < 1) → a right
    # row AT the left timestamp matches (ties included, like merge_asof).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        F.last("__r_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"__p_{p}", ignorenulls=True).over(w).alias(f"{p}_asof")
            for p in right_payload
        ],
    )
    return carried.where(F.col("__side") == 1).drop("__side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on_left: str,
    on_right: str,
    ts_left: str,
    ts_right: str,
    lower: str = "0 days",
    upper: str = "30 days",
) -> DataFrame:
    """Equi-join with a time-range predicate:
    key match AND ts_right ∈ [ts_left + lower, ts_left + upper].

    Catalyst keeps the equi-key as the hash-join key and applies the range
    as a join filter — no cartesian blowup."""
    cond = (
        (left[on_left] == right[on_right])
        & (right[ts_right] >= left[ts_left] + F.expr(f"INTERVAL {lower}"))
        & (right[ts_right] <= left[ts_left] + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(right, cond)
