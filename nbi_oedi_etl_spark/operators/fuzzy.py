"""Blocked fuzzy matching: edit-distance self-join with a blocking key —
the record-linkage primitive (beyond reference scope; SURVEY.md §2.12
posture — near-dup detection for short strings where shingles are too
coarse).

The naive fuzzy self-join is O(n²) levenshtein calls — a cross join no
engine survives at scale. Blocking makes it tractable: pairs are only
compared inside a cheap equality bucket (here: a prefix/token key), so
the plan is an equi-join shuffle on the block key plus per-bucket
pairwise scoring. With b buckets of size s the cost drops n²→b·s²; the
block key IS the recall/cost dial. Skewed buckets are the usual hazard —
AQE skew-join splits them, and a too-hot key should move to a finer
blocking function (that tuning is data-dependent, not engine logic).

Levenshtein itself is JVM codegen (``F.levenshtein``) — no python in the
pair loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_distinct_pairs(
    df: DataFrame,
    text_col: str,
    block_expr: Column,
    max_distance: int,
) -> DataFrame:
    """Blocked edit-distance pairs over the DISTINCT values of ``text_col``.

    The scale-correct shape for fuzzy matching over a corpus with repeated
    strings: dedupe first (one shuffle; the distinct set is usually orders
    of magnitude smaller than the corpus), compare distinct strings inside
    blocks, and only then — if the caller needs it — map matches back to
    row ids with an equi-join. Comparing at the id level instead multiplies
    every string-pair comparison by dup_count² — on data where a name
    repeats k times that is a k² pair explosion for identical outputs.

    Returns (text_a, text_b, distance, n_a, n_b) where n_* are the
    duplication counts of each string (the map-back cardinalities).
    """
    names = (
        df.select(F.col(text_col).alias("txt"), block_expr.alias("block"))
        .groupBy("txt", "block")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = names.select(
        F.col("txt").alias("text_a"), "block", F.col("n").alias("n_a")
    )
    b = names.select(
        F.col("txt").alias("text_b"), "block", F.col("n").alias("n_b")
    )
    return (
        a.join(b, "block")
        .where(F.col("text_a") < F.col("text_b"))
        .withColumn("distance", F.levenshtein("text_a", "text_b"))
        .where(F.col("distance") <= max_distance)
        .select("text_a", "text_b", "distance", "n_a", "n_b")
    )


def blocked_fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_expr: Column,
    max_distance: int,
) -> DataFrame:
    """All intra-block pairs (id_a < id_b) with edit distance ≤ threshold.

    Returns (id_a, id_b, text_a, text_b, distance).
    """
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
        block_expr.alias("block"),
    )
    a = keyed.select(
        F.col("id").alias("id_a"), F.col("txt").alias("text_a"), "block"
    )
    b = keyed.select(
        F.col("id").alias("id_b"), F.col("txt").alias("text_b"), "block"
    )
    return (
        a.join(b, "block")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.levenshtein("text_a", "text_b"))
        .where(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "text_a", "text_b", "distance")
    )
