"""Round-4 extension queries, wave 21: RFM segmentation, deterministic
null-imputation repair, and first/last-touch attribution.

- ``customer_rfm_segmentation`` — the classic recency / frequency /
  monetary customer segmentation: per-customer metrics, 1-5 quintile
  scores (ntile over deterministic total orders), and the combined
  segment code — the marketing-analytics rollup every warehouse runs.
- ``event_value_imputation`` — data-repair audit: a deterministic
  hash mask declares ~10% of event values missing, group means impute
  them, and the report shows per-type missingness and the pre/post
  means — the imputation pass of a feature pipeline, value-checked
  because both mask and means are exact.
- ``purchase_attribution_first_last`` — marketing attribution: each
  purchase credits (a) the immediately preceding event type
  (last-touch) and (b) the user's first-ever event type (first-touch);
  the report compares credited purchase counts and value under both
  models per event type.

Oracle convention identical to workload.py; quantized decimal sums per
the covariance recipe wherever double values aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table

# ------------------------------------------------- RFM segmentation


def customer_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation over customers with ≥ 1 order: recency (days
    from last order to the corpus max date), frequency (order count),
    monetary (cents-exact total spend), quintile scores — R descending
    recency (most recent = 5), F/M ascending (highest = 5) — and the
    concatenated segment code.

    Determinism: every ntile orders by (metric, c_custkey) — a total
    order, so quintile boundaries are engine-independent.

    Plan/scale: one orders rollup keyed on custkey; the three ntile
    windows run on the CUSTOMER aggregate (dimension-sized — the same
    bounded-window convention as revenue_pareto_analysis). A fact-sized
    RFM would bucket each metric first (two-pass prefix-sum shape).
    """
    o = read_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
    maxd = o.agg(F.max(F.to_date("o_orderdate")).alias("maxd"))
    per = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(cents).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.datediff("maxd", "last_order").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    r_score = F.ntile(5).over(Window.orderBy(F.desc("recency_days"), F.asc("c_custkey")))
    f_score = F.ntile(5).over(Window.orderBy(F.asc("frequency"), F.asc("c_custkey")))
    m_score = F.ntile(5).over(Window.orderBy(F.asc("monetary_cents"), F.asc("c_custkey")))
    scored = per.select(
        "c_custkey",
        F.col("recency_days").cast("long").alias("recency_days"),
        F.col("frequency").cast("long").alias("frequency"),
        F.round(F.col("monetary_cents").cast("double") / F.lit(100.0), 2).alias("monetary"),
        r_score.cast("long").alias("r_score"),
        f_score.cast("long").alias("f_score"),
        m_score.cast("long").alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat_ws("", F.col("r_score"), F.col("f_score"), F.col("m_score")),
    )


RFM_ORACLE = """
WITH per AS (
  SELECT o_custkey AS c_custkey,
         date_diff('day', max(CAST(o_orderdate AS DATE)),
                   (SELECT max(CAST(o_orderdate AS DATE)) FROM orders))
           AS recency_days,
         count(*) AS frequency,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT c_custkey,
         CAST(recency_days AS BIGINT) AS recency_days,
         CAST(frequency AS BIGINT) AS frequency,
         round(CAST(monetary_cents AS DOUBLE) / 100.0, 2) AS monetary,
         CAST(ntile(5) OVER (ORDER BY recency_days DESC, c_custkey ASC)
              AS BIGINT) AS r_score,
         CAST(ntile(5) OVER (ORDER BY frequency ASC, c_custkey ASC)
              AS BIGINT) AS f_score,
         CAST(ntile(5) OVER (ORDER BY monetary_cents ASC, c_custkey ASC)
              AS BIGINT) AS m_score
  FROM per
)
SELECT *, CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
            || CAST(m_score AS VARCHAR) AS segment
FROM scored
"""


# --------------------------------------------- imputation repair audit


def event_value_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-mean imputation audit: a deterministic mask (md5(event_id)
    mod 10 = 0, ~10% of rows) declares values missing; the per-type
    mean of the REMAINING values imputes them; the report shows, per
    event type: row/missing counts, the imputation value, and the
    pre-mask vs post-imputation means — the repair op plus its QA
    readout in one pass.

    Exactness: values quantize once to 1e-6 (the covariance recipe);
    present/missing sums are exact BIGINTs; the impute value and both
    means are single double divisions rounded to 6. The post mean is
    reconstructed algebraically (present_sum + n_missing·impute) — no
    re-aggregation of imputed rows, so nothing rounds twice.

    Plan/scale: the mask is a map-side expression; ONE grouped
    aggregate computes all counters. No second corpus pass.
    """
    ev = read_table(spark, sf_dir, "events")
    q = F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")
    missing = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 10
        == 0
    )
    g = ev.select("event_type", q.alias("q"), missing.alias("miss")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("miss").cast("bigint")).alias("n_missing"),
        F.sum(F.when(~F.col("miss"), F.col("q")).otherwise(F.lit(0))).alias("present_sum"),
        F.sum("q").alias("full_sum"),
    )
    n_present = (F.col("n_rows") - F.col("n_missing")).cast("double")
    impute = F.col("present_sum").cast("double") / F.lit(1e6) / n_present
    pre_mean = F.col("full_sum").cast("double") / F.lit(1e6) / F.col("n_rows").cast("double")
    post_mean = (
        F.col("present_sum").cast("double") / F.lit(1e6)
        + F.col("n_missing").cast("double") * impute
    ) / F.col("n_rows").cast("double")
    return g.select(
        "event_type",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_missing").cast("long").alias("n_missing"),
        F.round(impute, 6).alias("impute_value"),
        F.round(pre_mean, 6).alias("pre_mask_mean"),
        F.round(post_mean, 6).alias("post_impute_mean"),
    )


IMPUTATION_ORACLE = """
WITH base AS (
  SELECT event_type,
         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS q,
         ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 10 = 0
           AS miss
  FROM events
), g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN miss THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
         CAST(sum(CASE WHEN NOT miss THEN q ELSE 0 END) AS BIGINT) AS present_sum,
         CAST(sum(q) AS BIGINT) AS full_sum
  FROM base GROUP BY event_type
)
SELECT event_type, n_rows, n_missing,
       round(CAST(present_sum AS DOUBLE) / 1e6
             / CAST(n_rows - n_missing AS DOUBLE), 6) AS impute_value,
       round(CAST(full_sum AS DOUBLE) / 1e6 / CAST(n_rows AS DOUBLE), 6)
         AS pre_mask_mean,
       round((CAST(present_sum AS DOUBLE) / 1e6
              + CAST(n_missing AS DOUBLE)
                * (CAST(present_sum AS DOUBLE) / 1e6
                   / CAST(n_rows - n_missing AS DOUBLE)))
             / CAST(n_rows AS DOUBLE), 6) AS post_impute_mean
FROM g
"""


# --------------------------------------- first/last-touch attribution


def purchase_attribution_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-model comparison: each purchase credits the
    immediately preceding event's type (LAST-touch) and the user's
    first-ever event type (FIRST-touch). Per credited event type:
    purchase counts and cents-exact purchase value under each model —
    the table marketing uses to see how model choice moves budget.

    Purchases with no preceding event credit 'none' (first event of the
    user is itself the purchase under first-touch too).

    Plan/scale: one user-keyed window pass derives both the lag type
    and the user-first type (same exchange); the report is two
    event-type-sized aggregates stacked via a full outer join on the
    credited type.
    """
    ev = read_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfirst = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
    enriched = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        cents.alias("cents"),
        F.lag("event_type").over(wo).alias("prev_type"),
        F.first("event_type").over(wfirst).alias("first_type"),
    ).filter(F.col("event_type") == "purchase")
    last_touch = (
        enriched.groupBy(
            F.coalesce(F.col("prev_type"), F.lit("none")).alias("credited_type")
        )
        .agg(
            F.count(F.lit(1)).alias("last_touch_purchases"),
            F.sum("cents").alias("lt_cents"),
        )
    )
    first_touch = (
        enriched.groupBy(
            F.when(F.col("prev_type").isNull(), F.lit("none"))
            .otherwise(F.col("first_type"))
            .alias("credited_type")
        )
        .agg(
            F.count(F.lit(1)).alias("first_touch_purchases"),
            F.sum("cents").alias("ft_cents"),
        )
    )
    return (
        last_touch.join(first_touch, "credited_type", "full_outer")
        .select(
            "credited_type",
            F.coalesce("last_touch_purchases", F.lit(0)).cast("long").alias(
                "last_touch_purchases"
            ),
            F.round(
                F.coalesce(F.col("lt_cents"), F.lit(0)).cast("double") / F.lit(100.0), 2
            ).alias("last_touch_value"),
            F.coalesce("first_touch_purchases", F.lit(0)).cast("long").alias(
                "first_touch_purchases"
            ),
            F.round(
                F.coalesce(F.col("ft_cents"), F.lit(0)).cast("double") / F.lit(100.0), 2
            ).alias("first_touch_value"),
        )
    )


ATTRIBUTION_ORACLE = """
WITH enriched AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         first_value(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW)
           AS first_type
  FROM events
), p AS (
  SELECT * FROM enriched WHERE event_type = 'purchase'
), lt AS (
  SELECT coalesce(prev_type, 'none') AS credited_type,
         CAST(count(*) AS BIGINT) AS last_touch_purchases,
         CAST(sum(cents) AS BIGINT) AS lt_cents
  FROM p GROUP BY 1
), ft AS (
  SELECT CASE WHEN prev_type IS NULL THEN 'none' ELSE first_type END
           AS credited_type,
         CAST(count(*) AS BIGINT) AS first_touch_purchases,
         CAST(sum(cents) AS BIGINT) AS ft_cents
  FROM p GROUP BY 1
)
SELECT coalesce(lt.credited_type, ft.credited_type) AS credited_type,
       CAST(coalesce(last_touch_purchases, 0) AS BIGINT) AS last_touch_purchases,
       round(CAST(coalesce(lt_cents, 0) AS DOUBLE) / 100.0, 2) AS last_touch_value,
       CAST(coalesce(first_touch_purchases, 0) AS BIGINT) AS first_touch_purchases,
       round(CAST(coalesce(ft_cents, 0) AS DOUBLE) / 100.0, 2) AS first_touch_value
FROM lt FULL OUTER JOIN ft ON lt.credited_type = ft.credited_type
"""
