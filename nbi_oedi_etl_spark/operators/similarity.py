"""Embedding similarity search (SURVEY.md §2.12).

Two tiers:
- **brute-force top-k cosine**: broadcast the (small) query set against the
  corpus; per-row dot products via zip_with/aggregate (JVM higher-order
  functions, no UDF); per-query top-k via window rank (WindowGroupLimit keeps
  only k rows per partition).
- **LSH-bucketed (random hyperplane / sign-LSH)**: hash every vector to a
  b-bit signature via random hyperplanes; candidates = same-bucket pairs;
  exact cosine re-ranked only within buckets. Scale path: the corpus shuffle
  key is the bucket id, so a 100 TB corpus never all-pairs-joins. Recall is
  tuned by (num_tables, hyperplanes_per_table).

Precision discipline: embeddings are float32 on disk; all math is done after
casting to double so results are reproducible against external oracles.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.operators._util import ensure_parallelism


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must be small enough to broadcast (it is replicated to every
    corpus partition — the corpus itself never shuffles until the final
    per-query top-k, which moves only candidate rows thanks to
    WindowGroupLimit's partial top-k below the shuffle).
    Output: (query_id, vec_id, cos_sim rounded to 6, rank).
    """
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("emb")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_emb"),
    )
    pairs = c.crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("query_id"))
    sims = pairs.select(
        "query_id",
        "vec_id",
        cosine(F.col("emb"), F.col("q_emb")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("sim", 6).alias("cos_sim"), "rank")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side, tiny — broadcast as
    literals into the plan)."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def signlsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit i = sign(vec · plane_i) → integer bucket."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(vec, lit_plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit * F.lit(2**i).cast("long")
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's sign-LSH bucket
    are scored. One equi-join on bucket id instead of a cross join.

    At 100 TB: corpus is bucketed once (can be persisted bucketed-by-bucket),
    query fan-out is |buckets hit| ≈ 1 per table; use multiple tables for
    recall (union of per-table candidates, dedup, re-rank)."""
    planes = random_hyperplanes(dim, n_planes, seed)
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("emb")
    ).withColumn("bucket", signlsh_signature(F.col("emb"), planes))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_emb"),
    ).withColumn("bucket", signlsh_signature(F.col("q_emb"), planes))
    pairs = c.join(F.broadcast(q), "bucket").where(F.col("vec_id") != F.col("query_id"))
    sims = pairs.select(
        "query_id", "vec_id", cosine(F.col("emb"), F.col("q_emb")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("sim", 6).alias("cos_sim"), "rank")
    )
