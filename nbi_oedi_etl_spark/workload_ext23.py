"""Round-4 extension queries, wave 17: table profiling, running-unique
engagement, and OLS regression on exact sums.

- ``orders_column_profile`` — the ANALYZE/stats-collection surface: a
  long-format per-column profile of the orders table (null counts,
  distinct counts, typed min/max, Shannon entropy for the categorical
  columns) computed in ONE scan plus two value-histogram aggregates —
  the statistics a cost-based optimizer or data catalog harvests.
  Complements ``data_quality_report`` (constraint validation) with
  distribution description.
- ``cumulative_unique_users`` — running count of distinct users ever
  seen, per day: the canonical "cumulative uniques" metric, made
  shuffle-cheap by reducing to first-seen dates (distinct-to-date =
  count of first_seen ≤ d) instead of a running set union.
- ``order_ols_price_vs_items`` — ordinary-least-squares regression of
  order total price on line-item count: slope, intercept, and R² from
  the five classic sums — the regression member of the statistics
  family (z / χ² / t / OLS).

Oracle convention identical to workload.py. Float determinism: counts
and quantized sums are exact (BIGINT / DECIMAL(38,0)); ln calls follow
the established ln9 recipe (round(ln(x), 9) → DECIMAL before any
order-sensitive sum); final doubles are single expressions of exact
operands rounded once to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table

_LN2 = 0.6931471805599453  # shared literal; no engine calls ln(2)


def _entropy_expr(cnt_col, total_col):
    """Shannon entropy term recipe: p·ln(p) rounded once to 9 into
    DECIMAL so the cross-value sum is order-free exact; the /ln2
    conversion happens on the exact sum."""
    p = cnt_col.cast("double") / total_col.cast("double")
    return F.round(p * F.log(p), 9).cast("decimal(18,9)")


# ---------------------------------------------------- column profiler


def orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-format per-column profile of orders: non-null / null /
    distinct counts, typed min/max (numeric columns in ``min_num`` /
    ``max_num``; string/timestamp columns in ``min_str``/``max_str``),
    and Shannon entropy (bits) for the two low-cardinality categorical
    columns.

    Plan/scale: ONE scan of the six profiled columns, melted to
    (column, value) cells, then ONE hash aggregation into per-column
    value-count tables — every statistic (null/distinct counts, typed
    min/max, entropy) is then a tiny aggregate over those counts. This
    replaces the round-4 shape (six exact countDistinct in one agg),
    which Catalyst planned as a multi-distinct Expand duplicating every
    scan row ~7×; here the single shuffle carries partially-combined
    (column, value) counts — category-sized for five of the six columns
    — and NO Expand node appears (tests/test_plans.py pins this). The
    per-column totals table (6 rows) broadcasts back onto the value
    counts.

    Exactness: all counts exact; numeric min/max are exact long→double
    (keys < 2⁵³) or the column's own double (min/max commute with the
    melt's monotone casts); entropy uses the ln9 decimal recipe with a
    shared 1/ln2 literal — term-for-term the same expression as the
    round-4 shape, so the oracle is unchanged.
    """
    o = read_table(spark, sf_dir, "orders")
    num_cols = {"o_orderkey", "o_custkey", "o_totalprice"}
    ent_cols = ["o_orderstatus", "o_orderpriority"]
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]

    def cell(c: str):
        if c in num_cols:
            v_num, v_str = F.col(c).cast("double"), F.lit(None).cast("string")
        else:
            v_num, v_str = F.lit(None).cast("double"), F.col(c).cast("string")
        return F.struct(
            F.lit(c).alias("column"), v_num.alias("v_num"), v_str.alias("v_str")
        )

    melted = o.select(
        F.explode(F.array(*[cell(c) for c in cols])).alias("cv")
    ).select("cv.*")
    vc = melted.groupBy("column", "v_num", "v_str").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # every column contributes exactly one cell per source row, so the
    # per-column total is the table's row count — a parquet-metadata
    # count, not a second pass over the value-count pipeline
    n_rows = o.count()
    nonnull = F.col("v_num").isNotNull() | F.col("v_str").isNotNull()
    prof = (
        vc.withColumn("total", F.lit(n_rows).cast("bigint"))
        .groupBy("column")
        .agg(
            F.sum(F.when(nonnull, F.col("cnt")).otherwise(F.lit(0))).cast("long").alias("n_nonnull"),
            F.sum(F.when(~nonnull, F.col("cnt")).otherwise(F.lit(0))).cast("long").alias("n_null"),
            F.count(F.when(nonnull, F.lit(1))).cast("long").alias("n_distinct"),
            F.min("v_num").alias("raw_min_num"),
            F.max("v_num").alias("raw_max_num"),
            F.min("v_str").cast("string").alias("min_str"),
            F.max("v_str").cast("string").alias("max_str"),
            # entropy terms only for the categorical columns — the
            # divide/ln/round work must not ride along on every distinct
            # orderkey/custkey/price value just to be discarded later
            F.sum(
                F.when(
                    F.col("column").isin(*ent_cols),
                    _entropy_expr(F.col("cnt"), F.col("total")),
                )
            ).alias("t9_sum"),
        )
    )
    # a 0-row orders table melts to 0 cells, so `prof` would be empty —
    # but the profile's contract (and the oracle's no-GROUP-BY UNION ALL
    # shape) is one row per profiled column regardless of input size.
    # Left-join the aggregate onto a static 6-row column frame: counts
    # coalesce to 0, value stats stay NULL. Both sides are column-count
    # sized, so the join is a broadcast of driver-local rows.
    names = spark.createDataFrame([(c,) for c in cols], "column string")
    prof = names.join(F.broadcast(prof), "column", "left")
    return prof.select(
        "column",
        F.coalesce("n_nonnull", F.lit(0)).cast("long").alias("n_nonnull"),
        F.coalesce("n_null", F.lit(0)).cast("long").alias("n_null"),
        F.coalesce("n_distinct", F.lit(0)).cast("long").alias("n_distinct"),
        F.when(F.col("column") == "o_totalprice", F.round(F.col("raw_min_num"), 6))
        .otherwise(F.col("raw_min_num"))
        .cast("double")
        .alias("min_num"),
        F.when(F.col("column") == "o_totalprice", F.round(F.col("raw_max_num"), 6))
        .otherwise(F.col("raw_max_num"))
        .cast("double")
        .alias("max_num"),
        "min_str",
        "max_str",
        F.when(
            F.col("column").isin(*ent_cols),
            F.round(-F.col("t9_sum").cast("double") / F.lit(_LN2), 6),
        )
        .cast("double")
        .alias("entropy_bits"),
    )


COLUMN_PROFILE_ORACLE = """
WITH n AS (SELECT count(*) AS n_rows FROM orders),
ent AS (
  SELECT
    (SELECT round(-CAST(sum(t9) AS DOUBLE) / 0.6931471805599453, 6) FROM (
       SELECT CAST(round((CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
                * ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)), 9)
              AS DECIMAL(18,9)) AS t9
       FROM (SELECT o_orderstatus, count(*) AS cnt,
                    sum(count(*)) OVER () AS tot
             FROM orders GROUP BY o_orderstatus))) AS e_status,
    (SELECT round(-CAST(sum(t9) AS DOUBLE) / 0.6931471805599453, 6) FROM (
       SELECT CAST(round((CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
                * ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)), 9)
              AS DECIMAL(18,9)) AS t9
       FROM (SELECT o_orderpriority, count(*) AS cnt,
                    sum(count(*)) OVER () AS tot
             FROM orders GROUP BY o_orderpriority))) AS e_prio
)
SELECT 'o_orderkey' AS "column",
       CAST(count(o_orderkey) AS BIGINT) AS n_nonnull,
       CAST((SELECT n_rows FROM n) - count(o_orderkey) AS BIGINT) AS n_null,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(min(o_orderkey) AS DOUBLE) AS min_num,
       CAST(max(o_orderkey) AS DOUBLE) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
       CAST(NULL AS DOUBLE) AS entropy_bits
FROM orders
UNION ALL
SELECT 'o_custkey', CAST(count(o_custkey) AS BIGINT),
       CAST((SELECT n_rows FROM n) - count(o_custkey) AS BIGINT),
       CAST(count(DISTINCT o_custkey) AS BIGINT),
       CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE),
       NULL, NULL, NULL
FROM orders
UNION ALL
SELECT 'o_orderstatus', CAST(count(o_orderstatus) AS BIGINT),
       CAST((SELECT n_rows FROM n) - count(o_orderstatus) AS BIGINT),
       CAST(count(DISTINCT o_orderstatus) AS BIGINT),
       NULL, NULL, min(o_orderstatus), max(o_orderstatus),
       (SELECT e_status FROM ent)
FROM orders
UNION ALL
SELECT 'o_totalprice', CAST(count(o_totalprice) AS BIGINT),
       CAST((SELECT n_rows FROM n) - count(o_totalprice) AS BIGINT),
       CAST(count(DISTINCT o_totalprice) AS BIGINT),
       round(CAST(min(o_totalprice) AS DOUBLE), 6),
       round(CAST(max(o_totalprice) AS DOUBLE), 6),
       NULL, NULL, NULL
FROM orders
UNION ALL
SELECT 'o_orderdate', CAST(count(o_orderdate) AS BIGINT),
       CAST((SELECT n_rows FROM n) - count(o_orderdate) AS BIGINT),
       CAST(count(DISTINCT o_orderdate) AS BIGINT),
       NULL, NULL,
       CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR),
       NULL
FROM orders
UNION ALL
SELECT 'o_orderpriority', CAST(count(o_orderpriority) AS BIGINT),
       CAST((SELECT n_rows FROM n) - count(o_orderpriority) AS BIGINT),
       CAST(count(DISTINCT o_orderpriority) AS BIGINT),
       NULL, NULL, min(o_orderpriority), max(o_orderpriority),
       (SELECT e_prio FROM ent)
FROM orders
"""


# ------------------------------------------- cumulative unique users


def cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users ever seen, as of each active day, plus that day's
    newly-seen count. The running-set-union metric reduced to an
    aggregate: cumulative uniques at day d = |{users with first_seen ≤
    d}| — one per-user min, one day rollup, one calendar-bounded
    cumulative window.

    Plan/scale: the corpus collapses to per-user first-seen (keyed
    shuffle on user_id), then to per-day new-user counts; the running
    sum windows over the DAY table, whose cardinality is
    calendar-bounded, never over events.
    """
    ev = read_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("fday"))
    new_per_day = first_seen.groupBy("fday").agg(F.count(F.lit(1)).alias("new_users"))
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        days.join(new_per_day, days.day == new_per_day.fday, "left")
        .select("day", F.coalesce(F.col("new_users"), F.lit(0)).alias("new_users"))
        .withColumn("cumulative_users", F.sum("new_users").over(w))
        .select(
            "day",
            F.col("new_users").cast("long").alias("new_users"),
            F.col("cumulative_users").cast("long").alias("cumulative_users"),
        )
    )


CUMULATIVE_UNIQUE_ORACLE = """
WITH fs AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS fday FROM events GROUP BY user_id
), npd AS (
  SELECT fday, count(*) AS new_users FROM fs GROUP BY fday
), days AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
)
SELECT d.day,
       CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
       CAST(sum(coalesce(n.new_users, 0))
              OVER (ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cumulative_users
FROM days d LEFT JOIN npd n ON n.fday = d.day
"""


# ------------------------------------------------------- OLS on sums


def order_ols_price_vs_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS regression of order total price (y) on line-item count (x):
    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), intercept = ȳ − slope·x̄,
    R² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²)).

    Exactness: x is an exact item count; y quantizes once to cents
    (floor, the covariance recipe); all five sums are exact (BIGINT /
    DECIMAL(38,0) for the squared sums, overflow-proof at any corpus
    size); slope/intercept/R² are single double expressions of those
    exact sums, rounded to 6.

    Plan/scale: one lineitem rollup keyed on orderkey, one equi-join
    with orders on the same key, one total aggregate — partial
    aggregation map-side throughout.
    """
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    x = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("x"))
    yq = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
    pts = o.select(F.col("o_orderkey"), yq.alias("y")).join(
        x, o.o_orderkey == x.l_orderkey
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double") / F.lit(100.0)
    sxy = F.col("sxy").cast("double") / F.lit(100.0)
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double") / F.lit(10000.0)
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    intercept = sy / n - slope * sx / n
    r2 = (cov_n * cov_n) / (var_x * var_y)
    return s.select(
        F.col("n").cast("long").alias("n_orders"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


OLS_ORACLE = """
WITH x AS (
  SELECT l_orderkey, count(*) AS x FROM lineitem GROUP BY l_orderkey
), pts AS (
  SELECT x.x, CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
  FROM orders JOIN x ON o_orderkey = l_orderkey
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x * y AS DECIMAL(38,0))) AS sxy,
         sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
         sum(CAST(y * y AS DECIMAL(38,0))) AS syy
  FROM pts
), d AS (
  SELECT CAST(n AS DOUBLE) AS n, CAST(sx AS DOUBLE) AS sx,
         CAST(sy AS DOUBLE) / 100.0 AS sy,
         CAST(sxy AS DOUBLE) / 100.0 AS sxy,
         CAST(sxx AS DOUBLE) AS sxx,
         CAST(syy AS DOUBLE) / 10000.0 AS syy,
         n AS n_orders
  FROM s
)
SELECT CAST(n_orders AS BIGINT) AS n_orders,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round(sy / n - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx / n, 6)
         AS intercept,
       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM d
"""
