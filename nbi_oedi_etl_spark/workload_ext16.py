"""Round-4 extension queries, wave 10: end-to-end entity resolution and
algebraic materialized-view maintenance.

- ``part_golden_records`` — the full ER pipeline in one query:
  sorted-neighborhood candidate generation → edit-distance verification
  → transitive closure → SURVIVORSHIP (golden-record selection per
  entity cluster). Completes the record-linkage family: the candidate
  generators (equality blocking, sorted neighborhood) and the closure
  already exist as separate oracle-backed operators; this is the
  composed pipeline a master-data system actually runs.
- ``streaming_click_purchase_left_join`` — the stream-stream LEFT
  OUTER join with watermarks: the hardest streaming join shape (outer
  emission is gated on the min-of-sides global watermark and happens a
  batch late); drained to batch-equality via dual-side heartbeat
  sentinels, so it shares a plain-SQL LEFT JOIN oracle.
- ``resample_incremental_merge`` — algebraic incremental maintenance of
  the flagship hourly aggregate: partial aggregates from a BASE epoch
  and a DELTA epoch merge by re-aggregating mergeable state (count,
  sum, min) — and the oracle is the FULL recompute, proving
  merge-equals-recompute. The batch counterpart of the streaming
  foreachBatch accumulation, and the pattern behind every incremental
  materialized view.

Oracle convention identical to workload.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table

# ------------------------------------------------ ER golden records


def part_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution over part names: sorted-neighborhood
    candidates (per-block rank windows, offsets 1-2) → levenshtein ≤ 10
    verification → iterative connected components → golden record per
    entity cluster (survivorship rule: LONGEST name, ties to lowest
    partkey — the richest-record heuristic of master-data survivorship).

    Plan/scale — LOCAL CONTRACTION before the global closure (the
    pre-pass Kiveris et al. recommend for chain graphs): offset-1
    candidate edges connect RANK-ADJACENT rows, so their maximal runs
    are computable exactly with one per-block window (lag the name,
    verify with JVM levenshtein, cumulative-sum the cuts) — no
    iteration. Runs are guaranteed-connected chains, so contracting
    each to a super-node is an exact quotient: components of the
    quotient graph (runs + the offset-2 edges that BRIDGE distinct
    runs) equal components of the original. The general
    large-star/small-star closure then runs only on the bridge graph,
    whose size is bounded by the cut count — at sf0.1 that is 20 000
    nodes → 8 runs → 0 bridges, turning an 11-round closure into a
    no-op (measured 7 s → ~1.5 s); in the worst case (no offset-1
    matches) it degrades gracefully to the original edge set.
    Survivorship is one window over cluster members.
    """
    from nbi_oedi_etl_spark.operators import dedup

    p = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", F.substring("p_name", 1, 1).alias("blk")
    )
    wo = Window.partitionBy("blk").orderBy("p_name", "p_partkey")
    nodes = (
        p.select("p_partkey", "p_name", "blk", F.row_number().over(wo).alias("rnk"))
        .withColumn("prev1_name", F.lag("p_name", 1).over(wo))
        .withColumn("prev2_name", F.lag("p_name", 2).over(wo))
        .withColumn(
            "e1",
            F.coalesce(F.levenshtein("prev1_name", "p_name") <= 10, F.lit(False)),
        )
        .withColumn(
            "e2",
            F.coalesce(F.levenshtein("prev2_name", "p_name") <= 10, F.lit(False)),
        )
        .withColumn(
            "run",
            F.sum(F.when(F.col("e1"), 0).otherwise(1)).over(
                wo.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("runkey", F.concat_ws("#", "blk", "run"))
    )
    runs_of = nodes.select("blk", F.col("rnk").alias("rnk_a"), F.col("runkey").alias("run_a"))
    bridges = (
        nodes.where("e2")
        .select("blk", (F.col("rnk") - 2).alias("rnk_a"), F.col("runkey").alias("run_b"))
        .join(runs_of, ["blk", "rnk_a"])
        .where(F.col("run_a") != F.col("run_b"))
        .select(F.col("run_a").alias("doc_id_a"), F.col("run_b").alias("doc_id_b"))
    )
    rcomp = dedup.connected_components_star(bridges).withColumnRenamed("node", "runkey")
    members = (
        nodes.select("p_partkey", "p_name", "runkey")
        .join(rcomp, "runkey", "left")
        .withColumn("ckey", F.coalesce("component", "runkey"))
    )
    w = Window.partitionBy("ckey").orderBy(
        F.desc(F.length("p_name")), F.asc("p_partkey")
    )
    return (
        members.withColumn("rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(Window.partitionBy("ckey")))
        .withColumn("canonical_partkey", F.min("p_partkey").over(Window.partitionBy("ckey")))
        .where((F.col("rn") == 1) & (F.col("cluster_size") > 1))
        .select(
            "canonical_partkey",
            "cluster_size",
            F.col("p_partkey").alias("golden_partkey"),
            F.col("p_name").alias("golden_name"),
        )
    )


GOLDEN_RECORDS_ORACLE = """
WITH RECURSIVE ranked AS (
  SELECT p_partkey, p_name, substring(p_name, 1, 1) AS blk,
         row_number() OVER (PARTITION BY substring(p_name, 1, 1)
                            ORDER BY p_name, p_partkey) AS rnk
  FROM part
), pairs AS (
  SELECT a.p_partkey AS u, b.p_partkey AS v
  FROM ranked a
  JOIN ranked b ON a.blk = b.blk AND b.rnk - a.rnk IN (1, 2)
  WHERE levenshtein(a.p_name, b.p_name) <= 10
), e AS (
  SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM e
  UNION
  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
), comp AS (
  SELECT u AS node, least(u, min(v)) AS component FROM reach GROUP BY u
), members AS (
  SELECT c.component, p.p_partkey, p.p_name
  FROM comp c JOIN part p ON p.p_partkey = c.node
), golden AS (
  SELECT component, p_partkey AS golden_partkey, p_name AS golden_name
  FROM (
    SELECT component, p_partkey, p_name,
           row_number() OVER (PARTITION BY component
                              ORDER BY length(p_name) DESC, p_partkey ASC) AS rn
    FROM members
  ) WHERE rn = 1
), sizes AS (
  SELECT component, count(*) AS cluster_size FROM comp GROUP BY component
)
SELECT s.component AS canonical_partkey, s.cluster_size,
       g.golden_partkey, g.golden_name
FROM sizes s JOIN golden g USING (component)
WHERE s.cluster_size > 1
"""


# --------------------------------- incremental aggregate maintenance


def resample_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship hourly resample maintained INCREMENTALLY: partial
    aggregate state (count, decimal sum, min) computed separately for a
    base epoch (days ≤ Jan 15) and a delta epoch (the rest), then merged
    by re-aggregating the mergeable state — count+count, sum+sum,
    min(min). The oracle is the FULL single-pass recompute: algebraic
    aggregates guarantee merge ≡ recompute, which is the contract behind
    every incremental materialized view and the batch counterpart of the
    streaming foreachBatch sketch accumulation.

    Finalization (mean = sum/count) happens only AFTER the merge —
    finalize-then-merge is the classic incremental-MV bug this query's
    oracle would catch (a mean of means is not the mean).

    Plan/scale: each epoch's partial agg prunes on the date predicate at
    the scan; the merge aggregate runs over 2× the group cardinality,
    not the corpus. At 100 TB the delta epoch is a day's partition and
    the base state is a stored table — the recompute the oracle does is
    exactly what incremental maintenance avoids.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").cast("decimal(18,6)").alias("value"),
        "event_id",
    )
    cutoff = F.datediff(F.col("ts"), F.lit("1970-01-01")) <= F.lit(19737)

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "user_id", F.date_trunc("hour", F.col("ts")).alias("ts_hour")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("vsum"),
            F.min("event_id").alias("mineid"),
        )

    base = partial(ev.where(cutoff))
    delta = partial(ev.where(~cutoff))
    merged = (
        base.unionByName(delta)
        .groupBy("user_id", "ts_hour")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("vsum").alias("vsum"),
            F.min("mineid").alias("event_id_min"),
        )
    )
    return merged.select(
        "user_id",
        F.col("ts_hour").cast("timestamp_ntz").alias("ts_hour"),
        "n_events",
        "event_id_min",
        F.round(
            F.col("vsum").cast("double") / F.col("n_events"), 6
        ).alias("value_mean"),
    )


INCREMENTAL_MERGE_ORACLE = """
SELECT user_id,
       date_trunc('hour', ts) AS ts_hour,
       count(*) AS n_events,
       min(event_id) AS event_id_min,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
         AS value_mean
FROM events
GROUP BY user_id, date_trunc('hour', ts)
"""


# ------------------------- stream-stream LEFT OUTER join (watermarked)


def streaming_click_purchase_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join with watermarks — the hardest
    streaming join shape: unmatched left rows may only emit once the
    GLOBAL watermark (the MIN of both sides' watermarks) has provably
    passed their join window, and the emission happens in a LATER batch
    than the watermark advance. Three mechanics this query proves, each
    found empirically and each a production landmine:

    1. outer results flush in the batch AFTER the watermark passes —
       a drain needs trailing batches (two heartbeat sentinel files);
    2. the watermark is per-SIDE: a heartbeat that only carries clicks
       leaves the purchase watermark behind and the global watermark
       (min) never moves — each sentinel carries one row for EACH side
       (the missing-purchase case emitted 4 fewer rows);
    3. eviction runs inside the join operator, so the flush batches must
       contain rows that REACH the operator (filtered-out sentinels
       don't trigger it).

    The sentinels use negative user_ids (excluded from the output) and
    far-future timestamps, so after the drain the global watermark has
    passed every real row's window and the streaming answer equals the
    batch LEFT JOIN exactly — hence the plain-SQL oracle. At scale the
    heartbeat is the standard watermark-liveness pattern for low-traffic
    sides; the delay bound (1 minute here) is what bounds join state.
    """
    import tempfile

    from nbi_oedi_etl_spark.streaming import ingest

    s = ingest.scoped_streaming_session(spark)
    d = ingest.heartbeat_drain_dir(sf_dir, [("click", -1), ("purchase", -2)])
    stream = ingest.events_file_stream(s, sf_dir, max_files_per_trigger=1, stream_dir=d)

    def side(event_type: str, prefix: str) -> DataFrame:
        return (
            stream.where(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
                F.col("value").alias(f"{prefix}_value"),
            )
            .withWatermark(f"{prefix}_ts", "1 minute")
        )

    joined = side("click", "click").join(
        side("purchase", "purchase"),
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 2 HOURS")),
        "left_outer",
    )
    q = ingest.run_available_now(
        joined,
        tempfile.mkdtemp(),
        queue_name="stream_click_purchase_lo",
        output_mode="append",
    )
    q.awaitTermination()
    return (
        s.table("stream_click_purchase_lo")
        .where(F.col("click_user") >= 0)
        .select(
            F.col("click_id"),
            F.col("click_user").alias("user_id"),
            F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
            F.col("purchase_id"),
            F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
            F.col("purchase_value"),
        )
    )


STREAM_LEFT_JOIN_ORACLE = """
SELECT c.event_id AS click_id,
       c.user_id,
       c.ts AS click_ts,
       p.event_id AS purchase_id,
       p.ts AS purchase_ts,
       p.value AS purchase_value
FROM events c
LEFT JOIN events p
  ON p.event_type = 'purchase'
 AND c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 2 HOUR
WHERE c.event_type = 'click'
"""
