"""Round-3 extension queries: training-data pipeline write-side and
split-governance operators (beyond reference scope; SURVEY.md §2.12
posture). Oracle convention identical to workload.py: every query has a
DuckDB twin with column names aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table


# ------------------------------------------------- token-budget sharding

def corpus_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus sharding (operators/sharding.py): global
    running token total in doc_id order via the two-pass distributed
    prefix sum (order-preserving id buckets → tiny offset summary →
    parallel per-bucket cumsums), then shard = floor(exclusive-prefix /
    budget). The DuckDB twin is the plain single-node window cumsum —
    value-equality proves the distributed decomposition exact."""
    from nbi_oedi_etl_spark.operators import sharding

    docs = read_table(spark, sf_dir, "documents")
    return sharding.token_budget_shards(docs, budget_tokens=2000)


SHARD_ASSIGNMENT_ORACLE = r"""
WITH d AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM d
)
SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST((cum_tokens - n_tokens) // 2000 AS BIGINT) AS shard_id
FROM c
"""


# ------------------------------------------------- leakage-safe splits

def leakage_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates across
    splits: every document is keyed by the CANONICAL doc of its near-dup
    cluster (portable MinHash-LSH pairs → connected components,
    operators/dedup.py; singletons are their own canonical), and the
    split is a deterministic hash of that canonical id — so all members
    of a cluster land in the same split by construction. 80/10/10 via
    md5(canonical) % 10 (portable across engines).

    This is the split-governance step of a training pipeline: dedup
    without split-awareness still leaks eval data through surviving
    near-dups; hashing the cluster canonical closes that hole."""
    from nbi_oedi_etl_spark.workload_ext import portable_components

    docs = read_table(spark, sf_dir, "documents")
    comp = portable_components(spark, sf_dir)  # (node, component), memoized
    joined = docs.select("doc_id").join(
        comp, docs.doc_id == comp.node, "left"
    )
    canonical = F.coalesce(F.col("component"), F.col("doc_id"))
    bucket = (
        F.conv(F.substring(F.md5(canonical.cast("string")), 1, 4), 16, 10)
        .cast("bigint")
        % 10
    )
    return joined.select(
        "doc_id",
        canonical.alias("canonical_doc_id"),
        F.when(bucket < 8, "train")
        .when(bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
    )


LEAKAGE_SPLITS_ORACLE = r"""
WITH RECURSIVE d AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(len(toks) - 2),
             i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS s
  FROM d
), hs AS (
  SELECT doc_id, seed,
         min(('0x' || substring(md5(seed::VARCHAR || '|' || s), 1, 15))::BIGINT) AS m
  FROM sh, range(8) t(seed) GROUP BY doc_id, seed
), sig AS (
  SELECT doc_id, list(m ORDER BY seed) AS sig FROM hs GROUP BY doc_id
), bnd AS (
  SELECT doc_id, band, sig[2*band+1] AS v1, sig[2*band+2] AS v2
  FROM sig, range(4) t(band)
), pairs AS (
  SELECT DISTINCT a.doc_id AS u, b2.doc_id AS v
  FROM bnd a JOIN bnd b2 ON a.band = b2.band AND a.v1 = b2.v1 AND a.v2 = b2.v2
                         AND a.doc_id < b2.doc_id
), e AS (
  SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
), reach(u, v) AS (
  -- unbounded closure (UNION dedups per level and terminates at fixpoint):
  -- the Spark side iterates min-label propagation to convergence, so the
  -- oracle must be hop-unbounded too or a deep component would diverge
  SELECT u, v FROM e
  UNION
  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
), comp AS (
  SELECT u AS node, least(u, min(v)) AS component
  FROM reach
  GROUP BY u
), assigned AS (
  SELECT doc.doc_id,
         coalesce(c.component, doc.doc_id) AS canonical_doc_id
  FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.node
)
SELECT doc_id, canonical_doc_id,
       CASE WHEN ('0x' || substring(md5(canonical_doc_id::VARCHAR), 1, 4))::BIGINT % 10 < 8
            THEN 'train'
            WHEN ('0x' || substring(md5(canonical_doc_id::VARCHAR), 1, 4))::BIGINT % 10 = 8
            THEN 'val'
            ELSE 'test' END AS split
FROM assigned
"""
