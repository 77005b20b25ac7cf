"""Round-4 extension queries, wave 25: exact order-statistic confidence
intervals, journey similarity, and cohort LTV curves.

- ``median_ci_order_stats`` — the distribution-free 95% confidence
  interval for the median via exact binomial order-statistic ranks
  (no normal approximation, no resampling): rank bounds come from the
  exact Binomial(n, ½) CDF computed driver-side in integer arithmetic,
  and the bounding order statistics are selected DISTRIBUTED via the
  two-pass rank spine — statistical rigor as a DataFrame op.
- ``journey_similarity_matrix`` — pairwise edit distance between the
  top session journeys (sessions encoded as event-initial strings):
  the sequence-similarity readout over behavioral paths, bounded to
  the top-k journey vocabulary so the pair matrix is constant-sized.
- ``cohort_ltv_curve`` — cumulative revenue per user by cohort age in
  weeks (the LTV curve marketing reads off retention cohorts):
  first-seen week × weeks-since × running per-user cumulative value.

Oracle convention identical to workload.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table

# ----------------------------------- median CI via order statistics


def _median_ci_ranks(n: int) -> tuple[int, int]:
    """95% distribution-free CI ranks for the median: the classic
    large-sample order-statistic bounds l = ⌊(n − 1.96√n)/2⌋ (≥ 1),
    u = n + 1 − l. The same closed form, on the same IEEE doubles, is
    evaluated in the SQL oracle — deterministic cross-engine."""
    lo = max(1, int((n - 1.96 * n**0.5) / 2 // 1))
    return lo, n + 1 - lo


def median_ci_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median of order totals with its distribution-free 95% CI: the CI
    endpoints are ORDER STATISTICS at the classic rank bounds
    l = ⌊(n − 1.96√n)/2⌋, u = n + 1 − l — valid for any continuous
    distribution, no normality of the DATA assumed (the approximation
    is only in the binomial rank, standard practice).

    The rank bounds are two scalars computed on the driver; selecting
    the ranked values is the DISTRIBUTED two-pass prefix-sum rank
    (coarse value buckets → offsets → bucket window), never a global
    single-partition sort.

    Exactness: cents-quantized values, integer ranks; the median of an
    even n is the exact midpoint of the two central order statistics
    computed in integer cents. The oracle evaluates the identical rank
    formula on the identical IEEE doubles.
    """
    o = read_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
    vals = o.select(cents.alias("v"))
    n = vals.count()
    if n == 0:
        return spark.createDataFrame(
            [], "n long, median double, ci_lo double, ci_hi double"
        )
    lo_rank, hi_rank = _median_ci_ranks(n)
    med_lo, med_hi = (n + 1) // 2, (n + 2) // 2
    grp = vals.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
    grp = grp.withColumn("bucket", F.shiftright(F.col("v"), 20))
    btot = grp.groupBy("bucket").agg(F.sum("cnt").alias("bn"))
    woff = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = btot.select(
        "bucket", F.coalesce(F.sum("bn").over(woff), F.lit(0)).alias("boff")
    )
    win = Window.partitionBy("bucket").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # four rank probes (median pair + both CI endpoints) read this —
    # materialize the rank table once
    ranked = (
        grp.join(F.broadcast(offsets), "bucket")
        .withColumn("cum", F.coalesce(F.sum("cnt").over(win), F.lit(0)))
        .withColumn("lo", F.col("boff") + F.col("cum"))
        .withColumn("hi", F.col("lo") + F.col("cnt"))
        .cache()
    )

    def value_at(rank: int):
        return (
            ranked.filter((F.col("lo") < rank) & (F.col("hi") >= rank))
            .select(F.col("v"))
            .collect()[0][0]
        )

    m = (value_at(med_lo) + value_at(med_hi)) / 2.0 / 100.0
    return spark.createDataFrame(
        [(n, round(m, 6), value_at(lo_rank) / 100.0, value_at(hi_rank) / 100.0)],
        "n long, median double, ci_lo double, ci_hi double",
    )


# the oracle evaluates the identical closed-form rank bounds
MEDIAN_CI_ORACLE = """
WITH v AS (
  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v FROM orders
), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
bounds AS (
  SELECT n,
         greatest(1, CAST(floor((CAST(n AS DOUBLE)
             - 1.96 * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT)) AS lo
  FROM n
), r AS (
  SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v
), pick AS (
  SELECT
    (SELECT v FROM r WHERE rn = (b.n + 1) // 2) AS med_lo,
    (SELECT v FROM r WHERE rn = (b.n + 2) // 2) AS med_hi,
    (SELECT v FROM r WHERE rn = b.lo) AS ci_lo_c,
    (SELECT v FROM r WHERE rn = b.n + 1 - b.lo) AS ci_hi_c,
    b.n AS n
  FROM bounds b
)
SELECT n,
       round((CAST(med_lo AS DOUBLE) + CAST(med_hi AS DOUBLE)) / 2.0
             / 100.0, 6) AS median,
       CAST(ci_lo_c AS DOUBLE) / 100.0 AS ci_lo,
       CAST(ci_hi_c AS DOUBLE) / 100.0 AS ci_hi
FROM pick
"""


# --------------------------------------- journey similarity matrix

_TOP_JOURNEYS = 8
_GAP_MIN = 30


def journey_similarity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Levenshtein distance between the top-8 most common
    session journeys (a journey = the session's event-type initials in
    order, e.g. 'vcp' for view→click→purchase): how similar the
    dominant behavioral paths are — the sequence-analysis rollup.

    Plan/scale: sessionization and journey assembly are user-keyed
    window work; the journey vocabulary collapses to top-8 (+ counts),
    and the distance matrix is C(8,2) = 28 rows of JVM levenshtein on
    a broadcast-squared CONSTANT-size table — the same bounded-pair
    discipline as every similarity operator here.

    Determinism: top-8 selection orders by (count DESC, journey ASC).
    """
    ev = read_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = _GAP_MIN * 60
    marked = ev.select("user_id", "ts", "event_id", "event_type").withColumn(
        "new_s",
        (
            F.coalesce(
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(wo)),
                F.lit(gap + 1),
            )
            > gap
        ).cast("int"),
    )
    sess = marked.withColumn(
        "sid", F.sum("new_s").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    journeys = (
        sess.groupBy("user_id", "sid")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("c"))
                        )
                    ),
                    lambda x: x["c"],
                ),
            ).alias("journey")
        )
        .groupBy("journey")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    top = (
        journeys.withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.desc("n_sessions"), F.asc("journey"))),
        )
        .filter(F.col("rnk") <= _TOP_JOURNEYS)
        .select("journey", "n_sessions")
    )
    a = top.select(F.col("journey").alias("j_a"), F.col("n_sessions").alias("n_a"))
    b = top.select(F.col("journey").alias("j_b"), F.col("n_sessions").alias("n_b"))
    pair = a.crossJoin(F.broadcast(b)).filter(F.col("j_a") < F.col("j_b"))
    return pair.select(
        "j_a",
        "j_b",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.levenshtein("j_a", "j_b").cast("long").alias("edit_distance"),
    )


JOURNEY_SIM_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN coalesce(CAST(floor(epoch(ts)) AS BIGINT)
                    - CAST(floor(epoch(lag(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT),
                {_GAP_MIN * 60 + 1}) > {_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_s
  FROM events
), sid AS (
  SELECT user_id, ts, event_id, event_type,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
), journeys AS (
  SELECT string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS journey
  FROM sid GROUP BY user_id, sid
), counts AS (
  SELECT journey, count(*) AS n_sessions FROM journeys GROUP BY journey
), top AS (
  SELECT journey, n_sessions FROM (
    SELECT *, row_number() OVER (ORDER BY n_sessions DESC, journey ASC) AS rnk
    FROM counts
  ) WHERE rnk <= {_TOP_JOURNEYS}
)
SELECT a.journey AS j_a, b.journey AS j_b,
       CAST(a.n_sessions AS BIGINT) AS n_a,
       CAST(b.n_sessions AS BIGINT) AS n_b,
       CAST(levenshtein(a.journey, b.journey) AS BIGINT) AS edit_distance
FROM top a JOIN top b ON a.journey < b.journey
"""


# ------------------------------------------------- cohort LTV curve


def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per user by cohort age: users grouped by
    first-seen ISO week (keyed by the week's Monday DATE, so cohorts
    never collide across years); for each (cohort_week, weeks_since) cell, the
    cumulative purchase value per cohort user up to that age — the LTV
    curve read off the retention matrix.

    Exactness: cents-exact sums; cumulative via a window over the
    cohort-week × age grid (calendar-bounded); the per-user division
    rounds once.

    Plan/scale: one user-keyed first-seen aggregate, one
    (cohort, age)-keyed rollup, cumulative over the BOUNDED grid.
    """
    ev = read_table(spark, sf_dir, "events")
    fs = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("fd"))
    # ISO-week START DATE, not weekofyear(): the bare week number collides
    # across years (2024-W03 and 2025-W03 would merge) on any multi-year
    # corpus; date_trunc('week') keys the cohort by its Monday, unique
    # across years, identically in both engines
    cohort_week = F.to_date(F.date_trunc("week", F.col("fd")))
    cohort_size = fs.groupBy(
        cohort_week.alias("cohort_week")
    ).agg(F.countDistinct("user_id").alias("n_users"))
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.to_date("ts").alias("d"), cents.alias("cents")
    )
    aged = purchases.join(fs, "user_id").select(
        cohort_week.alias("cohort_week"),
        F.floor(F.datediff("d", "fd") / 7).cast("bigint").alias("weeks_since"),
        "cents",
    )
    cell = aged.groupBy("cohort_week", "weeks_since").agg(
        F.sum("cents").alias("cents")
    )
    wcum = Window.partitionBy("cohort_week").orderBy("weeks_since").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        cell.withColumn("cum_cents", F.sum("cents").over(wcum))
        .join(F.broadcast(cohort_size), "cohort_week")
        .select(
            F.col("cohort_week"),
            "weeks_since",
            F.col("n_users").cast("long").alias("cohort_users"),
            F.round(F.col("cum_cents").cast("double") / F.lit(100.0), 2).alias(
                "cum_revenue"
            ),
            F.round(
                F.col("cum_cents").cast("double")
                / F.lit(100.0)
                / F.col("n_users").cast("double"),
                6,
            ).alias("ltv_per_user"),
        )
    )


COHORT_LTV_ORACLE = """
WITH fs AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS fd FROM events GROUP BY user_id
), cs AS (
  SELECT CAST(date_trunc('week', fd) AS DATE) AS cohort_week,
         count(DISTINCT user_id) AS n_users
  FROM fs GROUP BY 1
), aged AS (
  SELECT CAST(date_trunc('week', fs.fd) AS DATE) AS cohort_week,
         CAST(floor(date_diff('day', fs.fd, CAST(e.ts AS DATE)) / 7.0)
              AS BIGINT) AS weeks_since,
         CAST(floor(e.value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events e JOIN fs ON e.user_id = fs.user_id
  WHERE e.event_type = 'purchase'
), cell AS (
  SELECT cohort_week, weeks_since, CAST(sum(cents) AS BIGINT) AS cents
  FROM aged GROUP BY 1, 2
), cum AS (
  SELECT cohort_week, weeks_since,
         sum(cents) OVER (PARTITION BY cohort_week ORDER BY weeks_since
                          ROWS UNBOUNDED PRECEDING) AS cum_cents
  FROM cell
)
SELECT cum.cohort_week AS cohort_week, weeks_since,
       CAST(cs.n_users AS BIGINT) AS cohort_users,
       round(CAST(cum_cents AS DOUBLE) / 100.0, 2) AS cum_revenue,
       round(CAST(cum_cents AS DOUBLE) / 100.0 / CAST(cs.n_users AS DOUBLE), 6)
         AS ltv_per_user
FROM cum JOIN cs ON cs.cohort_week = cum.cohort_week
"""
