"""Round-2 continuation: multi-resolution rollup cascade, SCD2 version
history, and the last missing join kinds (full outer, cross).

The cascade is the scale-relevant piece: at 100 TB you never re-scan raw
data to build a coarser rollup — you re-aggregate the finer rollup, which
requires the aggregate to be ALGEBRAIC (mean carried as (sum, count), not
as a mean). The reference's flagship transform is exactly such a mean
(etl/oedi_etl/transform.py:57-115), so its daily rollup composes from the
hourly one with a 24x smaller input.

Same determinism rules as workload.py: decimal sums (exact, fold-order
independent), one final double division performed identically by both
engines, INTEGER casts for row_number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.operators import text as text_ops
from nbi_oedi_etl_spark.sources import read_table


# ------------------------------------------------- multi-resolution cascade

def cascade_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup cascade: events → hourly (sum, count) →
    daily mean, where the daily tier aggregates the HOURLY tier, not raw.

    The hourly tier carries the mean decomposed as (decimal sum, count) —
    both algebraic, so re-aggregation is exact: sums of sums, sums of
    counts, one final division. Plan-wise the cascade is two hash
    aggregates; the second one's input is |hours| rows (~4 orders of
    magnitude smaller than raw at 100 TB), and AQE coalesces its shuffle
    to a handful of partitions. The oracle computes the daily mean from
    raw directly — matching proves the decomposition is lossless.
    """
    events = read_table(spark, sf_dir, "events")
    hourly = (
        events.groupBy("user_id", F.date_trunc("hour", "ts").alias("ts_hour"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("v_sum"),
            F.count("value").alias("n_events"),
        )
    )
    return (
        hourly.groupBy("user_id", F.date_trunc("day", "ts_hour").alias("ts_day"))
        .agg(
            F.sum("v_sum").alias("d_sum"),
            F.sum("n_events").alias("n_events"),
        )
        .select(
            "user_id",
            "ts_day",
            F.round(F.col("d_sum").cast("double") / F.col("n_events"), 6).alias(
                "value_mean"
            ),
            "n_events",
        )
    )


CASCADE_DAILY_ORACLE = """
SELECT user_id,
       date_trunc('day', ts) AS ts_day,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value), 6)
         AS value_mean,
       count(value) AS n_events
FROM events
GROUP BY user_id, date_trunc('day', ts)
"""


# ------------------------------------------------------------- SCD2 history

def scd2_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 version history: each event row
    becomes a version interval [valid_from, valid_to) per user, closed by
    the next event's timestamp; the newest version stays open
    (valid_to IS NULL, is_current = true).

    One window over (user_id ORDER BY ts, event_id) supplies lead() and
    row_number() in a single sort — no self-join. At scale the shuffle key
    is user_id (uniform) and this is the standard CDC-log → dimension-table
    materialization (complements dedup.latest_by_key, which keeps only the
    newest version).
    """
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("int").alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


SCD2_ORACLE = """
SELECT user_id,
       event_id,
       event_type,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       CAST(row_number() OVER w AS INTEGER) AS version,
       lead(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ------------------------------------------------- remaining join kinds

def full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two filtered per-nation aggregates (BUILDING
    customers vs high-balance suppliers): nations present on either side
    survive with the other side's count null-filled to 0.

    Both inputs aggregate to ≤25 rows before the join, so the outer join
    itself is trivially broadcastable; the cost profile is the two
    upstream aggregations, each one shuffle on nationkey.
    """
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    cust = (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("building_customers"))
    )
    supp = (
        s.where(F.col("s_acctbal") > 5000)
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("rich_suppliers"))
    )
    joined = cust.join(supp, cust.c_nationkey == supp.s_nationkey, "full_outer")
    key = F.coalesce(cust.c_nationkey, supp.s_nationkey)
    return (
        joined.select(
            key.alias("nationkey"),
            F.coalesce("building_customers", F.lit(0)).alias("building_customers"),
            F.coalesce("rich_suppliers", F.lit(0)).alias("rich_suppliers"),
        )
        .join(F.broadcast(n), F.col("nationkey") == n.n_nationkey)
        .select("nationkey", "n_name", "building_customers", "rich_suppliers")
    )


FULL_OUTER_ORACLE = """
SELECT COALESCE(cu.c_nationkey, su.s_nationkey) AS nationkey,
       n_name,
       COALESCE(building_customers, 0) AS building_customers,
       COALESCE(rich_suppliers, 0) AS rich_suppliers
FROM (
  SELECT c_nationkey, count(*) AS building_customers
  FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY c_nationkey
) cu
FULL OUTER JOIN (
  SELECT s_nationkey, count(*) AS rich_suppliers
  FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey
) su ON cu.c_nationkey = su.s_nationkey
JOIN nation ON COALESCE(cu.c_nationkey, su.s_nationkey) = n_nationkey
"""


def cross_join_region_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (region × region ordered pairs) — the
    one join kind with no key at all. Spark executes it as a
    BroadcastNestedLoopJoin when a side is small; an unconstrained cross
    join of two large tables is a plan error at 100 TB, so the operator is
    only sane dim × dim (as here) or with a pushed-down filter."""
    r = read_table(spark, sf_dir, "region")
    a = r.select(F.col("r_regionkey").alias("key_a"), F.col("r_name").alias("region_a"))
    b = r.select(F.col("r_regionkey").alias("key_b"), F.col("r_name").alias("region_b"))
    return a.crossJoin(b).where(F.col("key_a") != F.col("key_b")).select(
        "region_a", "region_b"
    )


CROSS_JOIN_ORACLE = """
SELECT a.r_name AS region_a, b.r_name AS region_b
FROM region a CROSS JOIN region b
WHERE a.r_regionkey <> b.r_regionkey
"""


# ------------------------------------------------- text-pipeline additions

def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction audit: the corpus is synthetic word-salad with no real
    PII, so the query plants a deterministic fake email + phone per doc
    (derived from doc_id), scrubs with operators.text.scrub_pii, and
    returns match counts plus the md5 of the scrubbed text. The oracle
    reproduces plant + scrub + hash in SQL — proving the regex semantics
    (match set AND replacement) are engine-independent, not just the
    counts."""
    d = read_table(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    out = text_ops.scrub_pii(planted)
    return out.select(
        "doc_id",
        "n_emails",
        "n_phones",
        F.md5(F.col("text_scrubbed")).alias("scrubbed_md5"),
    )


PII_SCRUB_ORACLE = r"""
WITH planted AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(text, '\b555-[0-9]{4}\b')) AS INTEGER) AS n_phones,
       md5(regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\b555-[0-9]{4}\b', '[PHONE]', 'g')) AS scrubbed_md5
FROM planted
"""


def doc_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style pretraining quality gate (operators.text
    .gopher_quality_flags): per-rule booleans + composite keep decision."""
    return text_ops.gopher_quality_flags(read_table(spark, sf_dir, "documents"))


GOPHER_FILTER_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_words,
         length(regexp_replace(text, '\s+', '', 'g')) * 1.0
           / len(regexp_split_to_array(trim(text), '\s+')) AS mean_wlen,
         length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) * 1.0
           / length(text) AS symbol_ratio,
         len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             x -> x IN ('the','and','of','to','a'))) > 0 AS has_stopword
  FROM documents
)
SELECT doc_id, n_words,
       n_words >= 50 AND n_words <= 100000 AS words_ok,
       mean_wlen >= 3.0 AND mean_wlen <= 10.0 AS mean_word_len_ok,
       symbol_ratio < 0.1 AS symbol_ratio_ok,
       has_stopword,
       (n_words >= 50 AND n_words <= 100000)
         AND (mean_wlen >= 3.0 AND mean_wlen <= 10.0)
         AND symbol_ratio < 0.1 AND has_stopword AS keep
FROM t
"""
