"""Round-4 extension queries, wave 22: bitmap-index set algebra,
piecewise-linear interpolation join, and conversion-latency
distribution.

- ``segment_bitmap_overlap`` — audience-overlap analytics on BITMAP
  indexes: each behavioral segment (users who emitted an event type)
  becomes a word-aligned bitmap (62 users/row), and pairwise overlap /
  Jaccard come from bitwise AND + popcount on word-aligned rows — the
  roaring-bitmap posture: set algebra on |users|/62-row state instead
  of user-level self-joins.
- ``order_rate_interpolation`` — piecewise-LINEAR interpolation join:
  each order's date looks up a small breakpoint curve (authoring-time
  rate table) and interpolates between surrounding knots — the
  financial curve-lookup shape (FX/discount curves) that generalizes
  the step-function as-of join.
- ``conversion_latency_histogram`` — distribution of first-view →
  first-purchase latency per user, bucketed on a log-ish grid: the
  time-to-convert readout beside the funnel's counts.

Oracle convention identical to workload.py; bitmap words use 62 bits
so every value stays positive in both engines (DuckDB raises on
1 << 63); latencies and lerp arithmetic are exact integers / single
rounded doubles.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table

# -------------------------------------------- bitmap segment overlap

_WORD_BITS = 62  # bit 63 = sign, bit 62 overflows DuckDB's << — stay positive


def segment_bitmap_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise overlap of behavioral segments via word-aligned bitmaps:
    users who emitted each event type become per-(segment, word) OR-ed
    bit masks; |A∩B| = Σ_words popcount(wordA AND wordB) over the
    word-equi-join, and Jaccard follows by inclusion-exclusion — never
    a user-level self-join.

    Plan/scale: segment state is ⌈|users|/62⌉ rows per segment (the
    bitmap index); building it is one distinct + one grouped bit_or
    with map-side partials; every pairwise set operation after that
    touches only bitmap rows. THE structure for audience/cohort algebra
    over billions of users.

    Exactness: masks and popcounts are exact integers; jaccard is one
    double division rounded to 6.
    """
    ev = read_table(spark, sf_dir, "events")
    du = ev.select("event_type", "user_id").distinct()
    bm = (
        du.select(
            "event_type",
            F.floor(F.col("user_id") / _WORD_BITS).cast("bigint").alias("word"),
            # F.shiftleft takes a Python-int bit count; a column-valued
            # shift needs the SQL expression form
            F.expr(f"shiftleft(1L, CAST(user_id % {_WORD_BITS} AS INT))").alias("m"),
        )
        .groupBy("event_type", "word")
        .agg(F.bit_or("m").alias("mask"))
        .cache()
    )
    sizes = bm.groupBy("event_type").agg(F.sum(F.bit_count("mask")).alias("n_users"))
    a = bm.select(F.col("event_type").alias("seg_a"), "word", F.col("mask").alias("ma"))
    b = bm.select(F.col("event_type").alias("seg_b"), "word", F.col("mask").alias("mb"))
    inter = (
        a.join(b, "word")
        .filter(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(F.sum(F.bit_count(F.col("ma").bitwiseAND(F.col("mb")))).alias("overlap"))
    )
    sa = sizes.select(F.col("event_type").alias("seg_a"), F.col("n_users").alias("na"))
    sb = sizes.select(F.col("event_type").alias("seg_b"), F.col("n_users").alias("nb"))
    jac = F.col("overlap").cast("double") / (
        F.col("na") + F.col("nb") - F.col("overlap")
    ).cast("double")
    return (
        inter.join(F.broadcast(sa), "seg_a")
        .join(F.broadcast(sb), "seg_b")
        .select(
            "seg_a",
            "seg_b",
            F.col("na").cast("long").alias("users_a"),
            F.col("nb").cast("long").alias("users_b"),
            F.col("overlap").cast("long").alias("overlap"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


BITMAP_OVERLAP_ORACLE = f"""
WITH du AS (
  SELECT DISTINCT event_type, user_id FROM events
), bm AS (
  SELECT event_type, user_id // {_WORD_BITS} AS word,
         bit_or(1::BIGINT << CAST(user_id % {_WORD_BITS} AS INTEGER)) AS mask
  FROM du GROUP BY 1, 2
), sizes AS (
  SELECT event_type, CAST(sum(bit_count(mask)) AS BIGINT) AS n_users
  FROM bm GROUP BY 1
), inter AS (
  SELECT a.event_type AS seg_a, b.event_type AS seg_b,
         CAST(sum(bit_count(a.mask & b.mask)) AS BIGINT) AS overlap
  FROM bm a JOIN bm b ON a.word = b.word AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT seg_a, seg_b,
       sa.n_users AS users_a, sb.n_users AS users_b, overlap,
       round(CAST(overlap AS DOUBLE)
             / CAST(sa.n_users + sb.n_users - overlap AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.event_type = seg_a
JOIN sizes sb ON sb.event_type = seg_b
"""


# ------------------------------------- piecewise-linear rate lookup

# (knot_date, rate): the authoring-time curve — exact decimal knots
_KNOTS = [
    ("1995-01-01", "1.00"),
    ("1997-01-01", "1.10"),
    ("1999-01-01", "1.35"),
    ("2001-01-01", "1.20"),
    ("2003-01-01", "1.50"),
]


def order_rate_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Piecewise-linear curve lookup: each order's date interpolates a
    rate between the surrounding knots of a small curve table; the
    result reports per order-year the exact-count and the adjusted
    revenue under the interpolated rate — the FX/discount-curve join.

    lerp = r₀ + (r₁−r₀)·(d−d₀)/(d₁−d₀) on integer day numbers and
    decimal knot rates: the fraction is rational, the product quantizes
    once to 1e-9 (floor, the covariance recipe) so the per-order
    adjusted cents stay exact BIGINTs through the year rollup.

    Plan/scale: the knot table (with its lead-joined next knot) is a
    constant broadcast; matching is a range predicate against it —
    map-side work; one year-keyed aggregate follows.
    """
    knots = spark.createDataFrame(
        [(k, Decimal(r)) for k, r in _KNOTS], "kd string, rate decimal(6,2)"
    ).select(F.to_date("kd").alias("kd"), "rate")
    w = Window.orderBy("kd")
    seg = knots.select(
        "kd",
        "rate",
        F.lead("kd").over(w).alias("kd1"),
        F.lead("rate").over(w).alias("rate1"),
    ).filter(F.col("kd1").isNotNull())
    o = read_table(spark, sf_dir, "orders")
    od = o.select(
        F.to_date("o_orderdate").alias("d"),
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("bigint").alias("cents"),
        F.year(F.to_date("o_orderdate")).alias("order_year"),
    )
    j = od.join(
        F.broadcast(seg),
        (F.col("d") >= F.col("kd")) & (F.col("d") < F.col("kd1")),
    )
    frac = F.datediff("d", "kd").cast("double") / F.datediff("kd1", "kd").cast("double")
    rate = F.col("rate").cast("double") + (
        F.col("rate1").cast("double") - F.col("rate").cast("double")
    ) * frac
    # adjusted value in 1e-9 dollars, floor-quantized once → exact sum
    adj_q = F.floor(
        F.col("cents").cast("double") / F.lit(100.0) * rate * F.lit(1e7) + F.lit(0.5)
    ).cast("bigint")
    g = (
        j.select("order_year", "cents", adj_q.alias("adj_q"))
        .groupBy("order_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
            F.sum("adj_q").alias("sum_adj_q"),
        )
    )
    return g.select(
        F.col("order_year").cast("long").alias("order_year"),
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round(F.col("sum_cents").cast("double") / F.lit(100.0), 2).alias("revenue"),
        F.round(F.col("sum_adj_q").cast("double") / F.lit(1e7), 4).alias(
            "adjusted_revenue"
        ),
    )


_KNOT_VALUES = ",\n         ".join(
    f"(DATE '{k}', CAST('{r}' AS DECIMAL(6,2)))" for k, r in _KNOTS
)

RATE_INTERP_ORACLE = f"""
WITH knots(kd, rate) AS (
  VALUES {_KNOT_VALUES}
), seg AS (
  SELECT kd, rate,
         lead(kd) OVER (ORDER BY kd) AS kd1,
         lead(rate) OVER (ORDER BY kd) AS rate1
  FROM knots
), od AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
         CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS order_year
  FROM orders
), j AS (
  SELECT od.*,
         CAST(seg.rate AS DOUBLE)
           + (CAST(seg.rate1 AS DOUBLE) - CAST(seg.rate AS DOUBLE))
             * (CAST(date_diff('day', seg.kd, od.d) AS DOUBLE)
                / CAST(date_diff('day', seg.kd, seg.kd1) AS DOUBLE)) AS rate
  FROM od JOIN seg ON od.d >= seg.kd AND od.d < seg.kd1
  WHERE seg.kd1 IS NOT NULL
), q AS (
  SELECT order_year, cents,
         CAST(floor(CAST(cents AS DOUBLE) / 100.0 * rate * 1e7 + 0.5) AS BIGINT)
           AS adj_q
  FROM j
)
SELECT order_year,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS revenue,
       round(CAST(sum(adj_q) AS DOUBLE) / 1e7, 4) AS adjusted_revenue
FROM q GROUP BY order_year
"""


# ------------------------------------- conversion latency histogram

_BUCKETS = [3600, 6 * 3600, 24 * 3600, 7 * 86400]  # 1h, 6h, 1d, 7d edges


def conversion_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of first-view → first-purchase latency per user:
    converting users bucket into ≤1h / ≤6h / ≤1d / ≤7d / >7d by exact
    integer seconds — the time-to-convert readout beside the funnel's
    conversion counts.

    Plan/scale: one user-keyed conditional-min aggregate collapses the
    corpus; bucketing is a map expression over |users| rows; the
    histogram is 5 rows.
    """
    ev = read_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    lat = (
        per.filter(
            F.col("first_view").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") >= F.col("first_view"))
        )
        .select(
            (
                F.unix_timestamp("first_purchase") - F.unix_timestamp("first_view")
            ).alias("sec")
        )
    )
    b = _BUCKETS
    bucket = (
        F.when(F.col("sec") <= b[0], F.lit("a_le_1h"))
        .when(F.col("sec") <= b[1], F.lit("b_le_6h"))
        .when(F.col("sec") <= b[2], F.lit("c_le_1d"))
        .when(F.col("sec") <= b[3], F.lit("d_le_7d"))
        .otherwise(F.lit("e_gt_7d"))
    )
    n_tot = lat.count()
    return (
        lat.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            "bucket",
            F.col("n_users").cast("long").alias("n_users"),
            F.round(
                F.col("n_users").cast("double") / F.lit(float(max(n_tot, 1))), 6
            ).alias("share"),
        )
    )


LATENCY_HIST_ORACLE = f"""
WITH per AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS fv,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
  FROM events GROUP BY user_id
), lat AS (
  SELECT CAST(date_diff('second', fv, fp) AS BIGINT) AS sec
  FROM per WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp >= fv
), n AS (SELECT count(*) AS tot FROM lat),
h AS (
  SELECT CASE WHEN sec <= {_BUCKETS[0]} THEN 'a_le_1h'
              WHEN sec <= {_BUCKETS[1]} THEN 'b_le_6h'
              WHEN sec <= {_BUCKETS[2]} THEN 'c_le_1d'
              WHEN sec <= {_BUCKETS[3]} THEN 'd_le_7d'
              ELSE 'e_gt_7d' END AS bucket,
         count(*) AS n_users
  FROM lat GROUP BY 1
)
SELECT bucket, CAST(n_users AS BIGINT) AS n_users,
       round(CAST(n_users AS DOUBLE)
             / CAST(greatest(n.tot, 1) AS DOUBLE), 6) AS share
FROM h CROSS JOIN n
"""
