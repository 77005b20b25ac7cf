"""Round-4 extension queries, wave 19: bounded-hop BFS distances,
precision-recall curve sweep, and a snapshot diff.

- ``copurchase_bfs_hops`` — single-source-set shortest-path distances
  (≤ 4 hops) over the part co-purchase graph by iterative min-distance
  relaxation: the traversal primitive beside the existing CC / PageRank
  / k-core / triangle family. Driver-coordinated rounds, per-round
  distributed, lineage truncated — the same iterate-and-checkpoint
  posture as connected_components.
- ``classifier_pr_curve`` — precision / recall / F1 of the wave-14
  classifier at 9 thresholds: the PR-curve sweep that complements the
  threshold-free ROC AUC. One scan, conditional aggregates against a
  broadcast threshold table.
- ``user_state_snapshot_diff`` — data-diff between two as-of snapshots
  of per-user latest state (added / changed / unchanged rows, old and
  new values) — the table-diff audit every incremental pipeline runs
  after a backfill.

Oracle convention identical to workload.py; all arithmetic integer or
single-rounded doubles of exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table
from nbi_oedi_etl_spark.workload_ext20 import _weight_expr

# ------------------------------------------------- bounded-hop BFS

_MAX_HOPS = 4
_SEED_BRAND = "Brand#11"


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-≥2 co-purchase edge list, canonical pa < pb — the same
    graph as copurchase_triangles/kcore (see workload_ext10.py)."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.countDistinct(F.col("a.l_orderkey")).alias("n"))
        .where(F.col("n") >= 2)
        .select("pa", "pb")
    )


def copurchase_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS distance (≤ 4 hops) from the seed set — parts of one brand —
    to every reachable part over the co-purchase graph.

    Iterative min-distance relaxation: dist₀ = seeds at 0; each round
    joins the frontier to the undirected edge list and keeps the
    per-node minimum. Rounds are driver-coordinated (4 = the hop bound,
    a constant) but each round is a distributed keyed join + aggregate;
    localCheckpoint truncates lineage so round r's plan doesn't replay
    rounds 0..r-1. The standard BSP/Pregel shape on DataFrames.

    Plan/scale: the edge list is built once and cached (node-keyed
    shuffles only); the frontier never exceeds |reachable nodes|.
    """
    edges = _copurchase_edges(spark, sf_dir)
    und = edges.union(
        edges.select(F.col("pb").alias("pa"), F.col("pa").alias("pb"))
    ).cache()
    part = read_table(spark, sf_dir, "part")
    graph_nodes = und.select(F.col("pa").alias("node")).distinct()
    seeds = (
        part.filter(F.col("p_brand") == _SEED_BRAND)
        .select(F.col("p_partkey").alias("node"))
        .join(graph_nodes, "node", "semi")
    )
    dist = seeds.select("node", F.lit(0).alias("dist")).localCheckpoint()
    for _ in range(_MAX_HOPS):
        relaxed = (
            dist.join(und, dist.node == und.pa)
            .select(F.col("pb").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return dist.select(
        F.col("node").alias("p_partkey"), F.col("dist").cast("long").alias("dist")
    )


BFS_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         count(DISTINCT a.l_orderkey) AS n
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2
), und AS (
  SELECT pa, pb FROM pairs UNION ALL SELECT pb, pa FROM pairs
), seeds AS (
  SELECT DISTINCT p_partkey AS node FROM part
  WHERE p_brand = '{_SEED_BRAND}'
    AND p_partkey IN (SELECT pa FROM und)
), walk(node, d) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT und.pb, walk.d + 1 FROM walk JOIN und ON walk.node = und.pa
  WHERE walk.d < {_MAX_HOPS}
)
SELECT node AS p_partkey, CAST(min(d) AS BIGINT) AS dist
FROM walk GROUP BY node
"""


# ---------------------------------------------------- PR-curve sweep

_THRESHOLDS = [round(0.1 * i, 1) for i in range(1, 10)]


def classifier_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision / recall / F1 of the wave-14 linear classifier at the
    9 deciles of the score axis (positive = label ≥ 5) — the
    threshold-sweep eval beside the threshold-free AUC.

    Exactness: thresholding compares the 6-rounded score (the exact
    published output of quality_classifier_inference) to shared double
    literals, so tie behavior is engine-identical; tp/fp/fn are exact
    counts and the three ratios single double divisions rounded to 6
    (try_divide: an empty-positive threshold row yields NULL, matching
    SQL NULL division).

    Plan/scale: the corpus collapses to (vec, score, pos) once; the
    9-row threshold table broadcast-joins on; each threshold's
    counters are map-side conditional partials.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "x"),
    )
    w = _weight_expr(F.col("i"))
    q = F.floor(F.col("x") * w * F.lit(1000000000.0) + F.lit(0.5)).cast("bigint")
    scored = dims.groupBy("vec_id", "label").agg(F.sum(q).alias("k"))
    logit = F.col("k").cast("double") / F.lit(1000000000.0) + F.lit(0.1)
    scored = scored.select(
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("score"),
        (F.col("label") >= 5).cast("int").alias("pos"),
    )
    th = spark.createDataFrame([(t,) for t in _THRESHOLDS], "threshold double")
    per = (
        scored.crossJoin(F.broadcast(th))
        .groupBy("threshold")
        .agg(
            F.sum(((F.col("score") >= F.col("threshold")) & (F.col("pos") == 1)).cast("bigint")).alias("tp"),
            F.sum(((F.col("score") >= F.col("threshold")) & (F.col("pos") == 0)).cast("bigint")).alias("fp"),
            F.sum(((F.col("score") < F.col("threshold")) & (F.col("pos") == 1)).cast("bigint")).alias("fn"),
        )
    )
    precision = F.try_divide(F.col("tp").cast("double"), (F.col("tp") + F.col("fp")).cast("double"))
    recall = F.try_divide(F.col("tp").cast("double"), (F.col("tp") + F.col("fn")).cast("double"))
    f1 = F.try_divide(
        F.lit(2.0) * F.col("tp").cast("double"),
        (F.lit(2.0) * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"),
    )
    return per.select(
        "threshold",
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


PR_CURVE_ORACLE = """
WITH dims AS (
  SELECT vec_id, label, CAST(i - 1 AS INTEGER) AS i,
         CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS x
  FROM (SELECT vec_id, label, embedding,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings)
), wdims AS (
  SELECT vec_id, label, x,
         CAST(('0x' || substring(md5('w|' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
              AS DOUBLE) / 1152921504606846976.0 - 0.5 AS w
  FROM dims
), scored AS (
  SELECT round(1.0 / (1.0 + exp(-(CAST(sum(CAST(floor(x * w * 1000000000.0 + 0.5)
                     AS BIGINT)) AS DOUBLE) / 1000000000.0 + 0.1))), 6) AS score,
         CAST(max(label) >= 5 AS INTEGER) AS pos
  FROM wdims GROUP BY vec_id, label
), th(threshold) AS (
  VALUES (0.1), (0.2), (0.3), (0.4), (0.5), (0.6), (0.7), (0.8), (0.9)
), per AS (
  SELECT threshold,
         CAST(sum(CASE WHEN score >= threshold AND pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN score >= threshold AND pos = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN score < threshold AND pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM scored CROSS JOIN th GROUP BY threshold
)
SELECT threshold, tp, fp, fn,
       round(CAST(tp AS DOUBLE) / nullif(CAST(tp + fp AS DOUBLE), 0), 6) AS precision,
       round(CAST(tp AS DOUBLE) / nullif(CAST(tp + fn AS DOUBLE), 0), 6) AS recall,
       round(2.0 * CAST(tp AS DOUBLE)
             / nullif(CAST(2 * tp + fp + fn AS DOUBLE), 0), 6) AS f1
FROM per
"""


# ---------------------------------------------------- snapshot diff

_CUTOFF = "2000-01-15"


def user_state_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-diff between two as-of snapshots of per-user latest state:
    snapshot v1 = latest event_type per user at 2000-01-15, v2 = latest
    over all data. Every user appears once with status 'added' (new in
    v2), 'changed' (state moved), or 'unchanged' — the row-level diff a
    pipeline audits after a backfill or engine migration.

    Plan/scale: both snapshots are latest-per-key windows over the SAME
    user-keyed exchange (v1 is a filtered twin); the diff is one full
    outer join on the key. Deterministic under equal timestamps via the
    (ts, event_id) total order.
    """
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))

    def snap(src: DataFrame) -> DataFrame:
        return (
            src.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_type")
        )

    v1 = snap(ev.filter(F.to_date("ts") <= F.lit(_CUTOFF).cast("date"))).select(
        "user_id", F.col("event_type").alias("old_type")
    )
    v2 = snap(ev).select("user_id", F.col("event_type").alias("new_type"))
    status = (
        F.when(F.col("old_type").isNull(), F.lit("added"))
        .when(F.col("old_type") != F.col("new_type"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return v1.join(v2, "user_id", "full_outer").select(
        "user_id", "old_type", "new_type", status.alias("status")
    )


SNAPSHOT_DIFF_ORACLE = f"""
WITH v1 AS (
  SELECT user_id, event_type AS old_type FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE CAST(ts AS DATE) <= DATE '{_CUTOFF}'
  ) WHERE rn = 1
), v2 AS (
  SELECT user_id, event_type AS new_type FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT coalesce(v1.user_id, v2.user_id) AS user_id, old_type, new_type,
       CASE WHEN old_type IS NULL THEN 'added'
            WHEN old_type <> new_type THEN 'changed'
            ELSE 'unchanged' END AS status
FROM v1 FULL OUTER JOIN v2 ON v1.user_id = v2.user_id
"""
