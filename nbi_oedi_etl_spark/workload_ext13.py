"""Round-4 extension queries, wave 7: bin-bucketed range self-join,
sorted-neighborhood record linkage, streaming sessionization, robust
(median/MAD) outlier statistics, and sketch-estimator quality auditing.

- ``rapid_reorder_pairs`` — temporal range SELF-join (orders by the
  same customer within 7 days of each other) executed as a BIN-BUCKETED
  equi-join: the standard rewrite that turns a non-equi range predicate
  into a shuffle-friendly (key, bucket) equi-join + exact residual
  filter. The one join shape Spark has no native operator for (range
  join) — the bucketing IS the 100 TB strategy.
- ``part_name_sorted_neighborhood`` — sorted-neighborhood blocking
  (Hernández & Stolfo SIGMOD'95): rank records within a block by sort
  key, candidates = pairs within rank distance ≤ 2, verify with edit
  distance. The second classic ER candidate generator beside equality
  blocking (part_name_fuzzy_pairs).
- ``streaming_session_window_stats`` — the built-in merging
  session_window as a STREAMING stateful aggregation (watermark +
  availableNow drain): the streaming twin of the batch
  session_window_stats, sharing its first-principles SQL oracle.
- ``event_value_mad_outliers`` — median / MAD (median absolute
  deviation) robust outlier detection per event type: the
  heavy-tail-safe complement of the z-score detector
  (event_value_anomalies). All medians exact via the doubled-value
  trick (2·median is a sum of one or two order statistics — no
  division until the surfaced columns).
- ``minhash_estimator_audit`` — signature-agreement Jaccard ESTIMATE
  (k agreeing seeds / 8) vs exact shingle-set Jaccard on the LSH
  candidate pairs: the estimator-error report for the MinHash family
  (the textbook E[agree/k] = J property, measured per pair). Completes
  the audit tier begun by ann_recall_portable.

Oracle convention identical to workload.py; float determinism per the
established recipe (exact DECIMAL/integer interiors, doubles only in
final rounded columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table

# ------------------------------- bin-bucketed temporal range self-join


def rapid_reorder_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of orders by the SAME customer placed within 7 days of each
    other — repeat-purchase / duplicate-submission detection. The
    predicate is a range (non-equi) join; Spark has no range-join
    operator, so the naive formulation degenerates to a per-customer
    cross product. The scale rewrite: bucket time into 7-day bins, have
    the LEFT side claim buckets {w, w+1} and the right side its own
    bucket — any pair within 7 days must share one of those bins — then
    apply the exact range predicate as a residual filter. Candidate
    volume drops from Σ n_c² to Σ (rows per (customer, adjacent-bin)
    pair), and the join is a plain shuffled equi-join on
    (custkey, bucket) that AQE can plan like any other.

    Pair orientation is total: earlier order is A; date ties break by
    orderkey — each unordered pair appears exactly once (a matching pair
    shares exactly ONE of A's two claimed bins, so no dedup pass is
    needed). Integer day arithmetic throughout: exact.
    """
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).alias("epoch_day"),
    )
    wk = F.floor(F.col("epoch_day") / 7)
    a = o.select(
        F.col("o_orderkey").alias("orderkey_a"),
        F.col("o_custkey").alias("custkey"),
        F.col("epoch_day").alias("eda"),
        F.explode(F.array(wk.cast("long"), (wk + 1).cast("long"))).alias("bucket"),
    )
    b = o.select(
        F.col("o_orderkey").alias("orderkey_b"),
        F.col("o_custkey").alias("custkey"),
        F.col("epoch_day").alias("edb"),
        wk.cast("long").alias("bucket"),
    )
    return (
        a.join(b, ["custkey", "bucket"])
        .where(
            (F.col("edb") >= F.col("eda"))
            & (F.col("edb") <= F.col("eda") + 7)
            & (
                (F.col("edb") > F.col("eda"))
                | (F.col("orderkey_a") < F.col("orderkey_b"))
            )
        )
        .select(
            "custkey",
            "orderkey_a",
            "orderkey_b",
            (F.col("edb") - F.col("eda")).alias("days_apart"),
        )
    )


RAPID_REORDER_ORACLE = """
SELECT a.o_custkey AS custkey,
       a.o_orderkey AS orderkey_a,
       b.o_orderkey AS orderkey_b,
       date_diff('day', a.o_orderdate, b.o_orderdate) AS days_apart
FROM orders a
JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND b.o_orderdate >= a.o_orderdate
 AND b.o_orderdate <= a.o_orderdate + INTERVAL 7 DAY
 AND (b.o_orderdate > a.o_orderdate OR a.o_orderkey < b.o_orderkey)
"""


# --------------------------------- sorted-neighborhood record linkage


def part_name_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo SIGMOD'95) over
    part names: within each first-letter block, rank by (p_name,
    p_partkey) and take pairs within rank distance ≤ 2, then verify with
    JVM levenshtein ≤ 10. The window-based ER candidate generator —
    complements equality blocking (part_name_fuzzy_pairs): equality
    blocks catch same-key typo families, the sorted window catches
    near-prefix variants equality keys split apart.

    Scale: ranking is PER BLOCK (never a global single-partition sort);
    the neighbor join is an equi-join on (block, rank) with the offset
    exploded on one side — the same bin trick as rapid_reorder_pairs.
    Candidate volume is exactly 2·|parts| before verification.
    """
    p = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", F.substring("p_name", 1, 1).alias("blk")
    )
    w = Window.partitionBy("blk").orderBy("p_name", "p_partkey")
    ranked = p.select("p_partkey", "p_name", "blk", F.row_number().over(w).alias("rnk"))
    a = ranked.select(
        F.col("p_partkey").alias("partkey_a"),
        F.col("p_name").alias("name_a"),
        "blk",
        F.explode(
            F.array(F.col("rnk") + 1, F.col("rnk") + 2)
        ).alias("nbr_rnk"),
    )
    b = ranked.select(
        F.col("p_partkey").alias("partkey_b"),
        F.col("p_name").alias("name_b"),
        "blk",
        F.col("rnk").alias("nbr_rnk"),
    )
    return (
        a.join(b, ["blk", "nbr_rnk"])
        .select(
            "partkey_a",
            "partkey_b",
            F.levenshtein("name_a", "name_b").alias("lev"),
        )
        .where(F.col("lev") <= 10)
    )


SORTED_NEIGHBORHOOD_ORACLE = """
WITH ranked AS (
  SELECT p_partkey, p_name, substring(p_name, 1, 1) AS blk,
         row_number() OVER (PARTITION BY substring(p_name, 1, 1)
                            ORDER BY p_name, p_partkey) AS rnk
  FROM part
)
SELECT a.p_partkey AS partkey_a, b.p_partkey AS partkey_b,
       levenshtein(a.p_name, b.p_name) AS lev
FROM ranked a
JOIN ranked b ON a.blk = b.blk AND b.rnk - a.rnk IN (1, 2)
WHERE levenshtein(a.p_name, b.p_name) <= 10
"""


# ------------------------------------ streaming session_window twin


def streaming_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization as a STREAMING stateful aggregation:
    file source → watermark → built-in merging session_window (30-minute
    gap) → availableNow drain. The streaming surface of the operator the
    batch ``session_window_stats`` proves; shares its first-principles
    lag/cumsum SQL oracle — the drained state must equal the batch
    answer exactly.

    At scale this is the continuous sessionizer: state is one row per
    OPEN session per user (merged on arrival by UpdatingSessionsIterator);
    the watermark closes and emits sessions whose gap has provably
    passed. One shuffle on user_id, no self-join, no batch rescan.
    """
    import tempfile

    from nbi_oedi_etl_spark.streaming import ingest

    s = ingest.scoped_streaming_session(spark)
    stream = ingest.events_file_stream(s, sf_dir).select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").cast("decimal(18,6)").alias("value"),
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum_dec"),
        )
    )
    q = ingest.run_available_now(
        agg, tempfile.mkdtemp(), queue_name="stream_sessions"
    )
    q.awaitTermination()
    return s.table("stream_sessions").select(
        "user_id",
        F.col("w.start").cast("timestamp_ntz").alias("session_start"),
        F.col("w.end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
        F.col("value_sum_dec").cast("double").alias("value_sum"),
    )


# ----------------------------------------- median/MAD robust outliers


def event_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier statistics per event type: median, MAD (median
    absolute deviation), and the count of |x − median| > 3·MAD outliers
    — the heavy-tail-safe complement of z-score detection
    (event_value_anomalies), whose mean/std both break under the very
    outliers being hunted.

    Exactness (the doubled-value trick): a median is the average of one
    or two order statistics — division by 2 would leave DECIMAL
    exactness, so the query carries 2·median (``med2``: the SUM of the
    two middle values, or twice the single middle) and 4·MAD (``mad4``)
    and compares 2·D > 3·mad4 in exact DECIMAL; the surfaced median and
    mad divide through doubles only in the final rounded columns.

    Scale: ranking partitions by event_type — a LOW-cardinality key, so
    per-group ranking is the honest cost of EXACT order statistics; at
    100 TB the approximate tier (quantile_sketch_order_price's
    deterministic bottom-k) replaces this; this query is the exact
    verification tier. Two rank windows + two tiny broadcast joins.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    w = Window.partitionBy("event_type").orderBy("v", "event_id")
    cnt = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cnt).alias("n"),
    )
    lo = F.floor((F.col("n") + 1) / 2)
    hi = F.floor((F.col("n") + 2) / 2)
    med = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(
            F.when(F.col("rn") == lo, F.col("v")).otherwise(F.lit(0))
            + F.when(F.col("rn") == hi, F.col("v")).otherwise(F.lit(0))
        ).alias("med2"),
    )
    dev = ev.join(F.broadcast(med.select("event_type", "med2")), "event_type").select(
        "event_type",
        "event_id",
        F.abs(F.col("v") * 2 - F.col("med2")).alias("d"),
    )
    w2 = Window.partitionBy("event_type").orderBy("d", "event_id")
    ranked2 = dev.select(
        "event_type",
        "d",
        F.row_number().over(w2).alias("rn"),
        F.count(F.lit(1)).over(cnt).alias("n"),
    )
    mad = ranked2.groupBy("event_type").agg(
        F.sum(
            F.when(F.col("rn") == lo, F.col("d")).otherwise(F.lit(0))
            + F.when(F.col("rn") == hi, F.col("d")).otherwise(F.lit(0))
        ).alias("mad4"),
    )
    stats = med.join(F.broadcast(mad), "event_type")
    outl = (
        dev.join(F.broadcast(stats.select("event_type", "mad4")), "event_type")
        .where(F.col("d") * 2 > F.col("mad4") * 3)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
    )
    return (
        stats.join(outl, "event_type", "left")
        .select(
            "event_type",
            "n",
            F.round(F.col("med2").cast("double") / 2, 6).alias("median"),
            F.round(F.col("mad4").cast("double") / 4, 6).alias("mad"),
            F.coalesce("n_outliers", F.lit(0)).alias("n_outliers"),
        )
    )


MAD_OUTLIERS_ORACLE = """
WITH ev AS (
  SELECT event_type, event_id, CAST(value AS DECIMAL(18,6)) AS v FROM events
), ranked AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev
), med AS (
  SELECT event_type, max(n) AS n,
         sum(CASE WHEN rn = (n+1)//2 THEN v ELSE 0 END
             + CASE WHEN rn = (n+2)//2 THEN v ELSE 0 END) AS med2
  FROM ranked GROUP BY event_type
), dev AS (
  SELECT ev.event_type, ev.event_id, abs(ev.v * 2 - med.med2) AS d
  FROM ev JOIN med USING (event_type)
), ranked2 AS (
  SELECT event_type, d,
         row_number() OVER (PARTITION BY event_type ORDER BY d, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM dev
), mad AS (
  SELECT event_type,
         sum(CASE WHEN rn = (n+1)//2 THEN d ELSE 0 END
             + CASE WHEN rn = (n+2)//2 THEN d ELSE 0 END) AS mad4
  FROM ranked2 GROUP BY event_type
), outl AS (
  SELECT dev.event_type, count(*) AS n_outliers
  FROM dev JOIN mad USING (event_type)
  WHERE dev.d * 2 > mad.mad4 * 3
  GROUP BY dev.event_type
)
SELECT med.event_type, CAST(med.n AS BIGINT) AS n,
       round(CAST(med.med2 AS DOUBLE) / 2, 6) AS median,
       round(CAST(mad.mad4 AS DOUBLE) / 4, 6) AS mad,
       CAST(coalesce(outl.n_outliers, 0) AS BIGINT) AS n_outliers
FROM med
JOIN mad USING (event_type)
LEFT JOIN outl USING (event_type)
"""


# --------------------------------------- MinHash estimator audit


def minhash_estimator_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature-agreement Jaccard ESTIMATE vs exact shingle-set Jaccard
    on the LSH candidate pairs — the estimator-error report for the
    MinHash family. E[agreeing seeds / k] = J is the property the whole
    LSH pipeline rests on; this measures it per candidate pair (est,
    exact, |error|), the audit a pipeline owner runs before trusting a
    banding configuration at 100 TB. Completes the quality-measurement
    tier begun by ann_recall_portable (ANN) for the dedup family.

    Scale: signatures and candidate pairs are the SAME stages the
    production pipeline runs (shared helpers); exact Jaccard touches
    candidates only. est = k/8 is exactly representable in double (k ≤ 8),
    so even the error column value-hash-checks. The signature table is
    localCheckpoint-materialized ONCE and feeds both the banded self-join
    and the per-side agreement lookups — without it the explode + window
    + 8-seed md5 pipeline runs up to 4× inside one plan.
    """
    from nbi_oedi_etl_spark.operators import dedup
    from nbi_oedi_etl_spark.workload_ext import (
        _portable_minhash_pairs,
        portable_signatures_cached,
    )

    docs = read_table(spark, sf_dir, "documents")
    sig = portable_signatures_cached(spark, sf_dir)
    pairs = _portable_minhash_pairs(docs, sig=sig)
    sa = sig.select(
        F.col("doc_id").alias("doc_id_a"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(8)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_id_b"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(8)],
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(8)
    )
    est = pairs.join(sa, "doc_id_a").join(sb, "doc_id_b").select(
        "doc_id_a",
        "doc_id_b",
        (agree.cast("double") / F.lit(8.0)).alias("est_jaccard"),
    )
    exact = dedup.ngram_jaccard(docs, pairs).select(
        "doc_id_a", "doc_id_b", F.col("jaccard").alias("exact_jaccard")
    )
    return est.join(exact, ["doc_id_a", "doc_id_b"]).select(
        "doc_id_a",
        "doc_id_b",
        "est_jaccard",
        "exact_jaccard",
        F.round(F.abs(F.col("est_jaccard") - F.col("exact_jaccard")), 6).alias(
            "abs_err"
        ),
    )


MINHASH_AUDIT_ORACLE = r"""
WITH d AS (
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
  SELECT DISTINCT a.doc_id AS doc_id_a, b2.doc_id AS doc_id_b
  FROM bnd a JOIN bnd b2 ON a.band = b2.band AND a.v1 = b2.v1 AND a.v2 = b2.v2
                         AND a.doc_id < b2.doc_id
), est AS (
  SELECT p.doc_id_a, p.doc_id_b,
         CAST(len(list_filter(range(1, 9),
                  i -> sa.sig[CAST(i AS INTEGER)] = sb.sig[CAST(i AS INTEGER)]))
              AS DOUBLE) / 8.0 AS est_jaccard
  FROM pairs p
  JOIN sig sa ON sa.doc_id = p.doc_id_a
  JOIN sig sb ON sb.doc_id = p.doc_id_b
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT p.doc_id_a, p.doc_id_b, count(*) AS n_inter
  FROM pairs p
  JOIN sh a ON a.doc_id = p.doc_id_a
  JOIN sh b ON b.doc_id = p.doc_id_b AND b.s = a.s
  GROUP BY p.doc_id_a, p.doc_id_b
), exact AS (
  SELECT i.doc_id_a, i.doc_id_b,
         round(i.n_inter / (na.n + nb.n - i.n_inter), 6) AS exact_jaccard
  FROM inter i
  JOIN sizes na ON na.doc_id = i.doc_id_a
  JOIN sizes nb ON nb.doc_id = i.doc_id_b
)
SELECT e.doc_id_a, e.doc_id_b, e.est_jaccard,
       coalesce(x.exact_jaccard, 0) AS exact_jaccard,
       round(abs(e.est_jaccard - coalesce(x.exact_jaccard, 0)), 6) AS abs_err
FROM est e
LEFT JOIN exact x ON e.doc_id_a = x.doc_id_a AND e.doc_id_b = x.doc_id_b
"""
