"""Round-4 extension queries, wave 24: KS uniformity testing, exact
equi-depth histograms without a global sort, and grouped OLS.

- ``hash_uniformity_ks`` — one-sample Kolmogorov–Smirnov test of the
  repo's md5→[0,1) bridge against U(0,1): D = max(ECDF−CDF, CDF−ECDF)
  over the corpus, ranked by the SAME distributed two-pass prefix sum
  as classifier_roc_auc — the statistical certificate for every
  hash-derived sampler/splitter in the registry.
- ``order_price_equidepth_histogram`` — the optimizer-stats artifact:
  a 10-bucket equi-depth histogram of order totals with EXACT ntile
  semantics, computed from grouped value counts + integer range
  intersection instead of a corpus-wide ntile window.
- ``brand_price_quantity_ols`` — per-brand OLS of extended price on
  quantity: grouped model fitting (one slope/intercept/R² per brand)
  as a single aggregate — the segmented-regression shape.

Oracle convention identical to workload.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table

# ------------------------------------------------ KS uniformity test


def hash_uniformity_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sample KS statistic of u = md5(doc_id)/2⁶⁰ against U(0,1):
    D⁺ = max_i (i/n − u_(i)), D⁻ = max_i (u_(i) − (i−1)/n), D = max —
    with ties handled on grouped value counts (a group occupying ranks
    [lo+1, lo+n_g] contributes hi-rank/n for D⁺ and lo-rank/n for D⁻).

    Ranking is the DISTRIBUTED two-pass prefix sum (coarse value
    buckets → bounded offset table → bucket-partitioned window) — the
    classifier_roc_auc spine; no single-partition sort of the corpus.

    Exactness: u is an exact 60-bit integer over 2⁶⁰; ranks are exact;
    the deviations are single double expressions of (exact int, exact
    int) pairs, and the max is order-free. Result rounds to 6 and
    reports the 95% critical value 1.358/√n for the verdict column.
    """
    d = read_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    vals = d.select(h.alias("hv"))
    grp = vals.groupBy("hv").agg(F.count(F.lit(1)).alias("n"))
    grp = grp.withColumn("bucket", F.shiftright(F.col("hv"), 52))  # 256 coarse buckets
    btot = grp.groupBy("bucket").agg(F.sum("n").alias("bn"))
    woff = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = btot.select(
        "bucket", F.coalesce(F.sum("bn").over(woff), F.lit(0)).alias("boff")
    )
    win = Window.partitionBy("bucket").orderBy("hv").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = (
        grp.join(F.broadcast(offsets), "bucket")
        .withColumn("cum", F.coalesce(F.sum("n").over(win), F.lit(0)))
        .withColumn("lo", F.col("boff") + F.col("cum"))
        .withColumn("hi", F.col("lo") + F.col("n"))
    )
    n_tot = vals.count()
    u = F.col("hv").cast("double") / F.lit(float(2**60))
    dev = ranked.select(
        (F.col("hi").cast("double") / F.lit(float(n_tot)) - u).alias("dplus"),
        (u - F.col("lo").cast("double") / F.lit(float(n_tot))).alias("dminus"),
    ).agg(F.max("dplus").alias("dp"), F.max("dminus").alias("dm"))
    crit = 1.358 / float(max(n_tot, 1)) ** 0.5  # guard the 0-row corpus
    return dev.select(
        F.lit(n_tot).cast("long").alias("n"),
        F.round(F.greatest("dp", "dm"), 6).alias("ks_d"),
        F.round(F.lit(crit), 6).alias("crit_95"),
        (F.greatest("dp", "dm") < F.lit(crit)).alias("uniform_at_95"),
    )


KS_ORACLE = """
WITH vals AS (
  SELECT ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM documents
), n AS (SELECT count(*) AS tot FROM vals),
grp AS (
  SELECT hv, count(*) AS cnt FROM vals GROUP BY hv
), ranked AS (
  SELECT hv, cnt,
         sum(cnt) OVER (ORDER BY hv ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS lo0
  FROM grp
), dev AS (
  SELECT max(CAST(coalesce(lo0, 0) + cnt AS DOUBLE) / CAST(n.tot AS DOUBLE)
             - CAST(hv AS DOUBLE) / 1152921504606846976.0) AS dp,
         max(CAST(hv AS DOUBLE) / 1152921504606846976.0
             - CAST(coalesce(lo0, 0) AS DOUBLE) / CAST(n.tot AS DOUBLE)) AS dm
  FROM ranked CROSS JOIN n
)
SELECT CAST(n.tot AS BIGINT) AS n,
       round(greatest(dp, dm), 6) AS ks_d,
       round(1.358 / sqrt(CAST(n.tot AS DOUBLE)), 6) AS crit_95,
       greatest(dp, dm) < 1.358 / sqrt(CAST(n.tot AS DOUBLE)) AS uniform_at_95
FROM dev CROSS JOIN n
"""


# ------------------------------------ exact equi-depth histogram

_BINS = 10


def order_price_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-bucket equi-depth histogram of order totals with EXACT ntile
    semantics — row r (1-based, ordered by price then orderkey ties
    collapsed to value groups) goes to bin ⌊(r−1)·B/N⌋ — computed
    WITHOUT a corpus-wide ntile window: group by exact cents value,
    rank groups by the two-pass prefix sum, intersect each group's rank
    interval [lo+1, lo+n] with each bin's rank interval by integer
    arithmetic, and aggregate per bin.

    Exactness: everything is integer until the reported bin bounds
    (cents/100, round 2). The floor-of-scaled-rank rule is reproduced
    by closed-form rank intervals — bin b covers ranks
    [⌈b·N/B⌉+1, ⌈(b+1)·N/B⌉], exactly the oracle's row-level
    ⌊(r−1)·B/N⌋ assignment.

    Plan/scale: value groups shuffle once; bin assignment is a ≤B-row
    fan-out per group via a broadcast bin table; no single-partition
    pass over row-level data.
    """
    o = read_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
    grp = o.select(cents.alias("v")).groupBy("v").agg(F.count(F.lit(1)).alias("n"))
    grp = grp.withColumn("bucket", F.shiftright(F.col("v"), 20))
    btot = grp.groupBy("bucket").agg(F.sum("n").alias("bn"))
    woff = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = btot.select(
        "bucket", F.coalesce(F.sum("bn").over(woff), F.lit(0)).alias("boff")
    )
    win = Window.partitionBy("bucket").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = (
        grp.join(F.broadcast(offsets), "bucket")
        .withColumn("cum", F.coalesce(F.sum("n").over(win), F.lit(0)))
        .withColumn("lo", F.col("boff") + F.col("cum"))
        .withColumn("hi", F.col("lo") + F.col("n"))
    )
    n_tot = o.count()
    # bin b holds ranks r with floor((r-1)·B/N) = b, i.e.
    # r ∈ [⌈b·N/B⌉ + 1, ⌈(b+1)·N/B⌉] — ceil, not floor: with N=25, B=10
    # bin 0 is ranks 1..3, not 1..2. The ceil is EXACT integer arithmetic
    # ((a + B − 1) div B), not ceil of a double quotient — b·N can pass
    # 2⁵³ at the 100 TB posture, where the float ceil goes off-by-one
    bins = spark.range(_BINS).select(
        F.col("id").cast("bigint").alias("bin"),
        (F.expr(f"(id * {n_tot}L + {_BINS - 1}) div {_BINS}") + 1).alias("r_lo"),
        F.expr(f"((id + 1) * {n_tot}L + {_BINS - 1}) div {_BINS}").alias("r_hi"),
    )
    j = ranked.join(
        F.broadcast(bins),
        (F.col("lo") + 1 <= F.col("r_hi")) & (F.col("hi") >= F.col("r_lo")),
    )
    rows_in = F.least(F.col("hi"), F.col("r_hi")) - F.greatest(
        F.col("lo") + 1, F.col("r_lo")
    ) + 1
    return (
        j.groupBy("bin")
        .agg(
            F.sum(rows_in).alias("n_rows"),
            F.min("v").alias("lo_c"),
            F.max("v").alias("hi_c"),
        )
        .select(
            "bin",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round(F.col("lo_c").cast("double") / F.lit(100.0), 2).alias("bin_lo"),
            F.round(F.col("hi_c").cast("double") / F.lit(100.0), 2).alias("bin_hi"),
        )
    )


EQUIDEPTH_ORACLE = f"""
WITH v AS (
  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v
  FROM orders
), r AS (
  SELECT v, row_number() OVER (ORDER BY v) AS rn,
         count(*) OVER () AS n
  FROM v
), b AS (
  SELECT v, CAST(((rn - 1) * {_BINS}) // n AS BIGINT) AS bin FROM r
)
SELECT bin, CAST(count(*) AS BIGINT) AS n_rows,
       round(CAST(min(v) AS DOUBLE) / 100.0, 2) AS bin_lo,
       round(CAST(max(v) AS DOUBLE) / 100.0, 2) AS bin_hi
FROM b GROUP BY bin
"""


# ----------------------------------------------------- grouped OLS


def brand_price_quantity_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS of extended price (y, cents-exact) on quantity
    (x): segmented model fitting as ONE grouped aggregate — every brand
    gets slope, intercept, and R² from the five classic sums, no
    per-group iteration.

    Exactness: x quantizes to 1e-2 grid (quantity carries at most 2
    decimals), y to cents; squared sums in DECIMAL(38,0); the final
    doubles are identical expressions of exact sums, rounded to 6.

    Plan/scale: lineitem ⋈ broadcast part, one (brand)-grouped
    aggregate with map-side partials — embarrassingly parallel.
    """
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    x = F.floor(F.col("l_quantity") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
    y = F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
    pts = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_brand", x.alias("x"), y.alias("y")
    )
    s = pts.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double") / F.lit(100.0)
    sy = F.col("sy").cast("double") / F.lit(100.0)
    sxy = F.col("sxy").cast("double") / F.lit(10000.0)
    sxx = F.col("sxx").cast("double") / F.lit(10000.0)
    syy = F.col("syy").cast("double") / F.lit(10000.0)
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    return s.select(
        "p_brand",
        F.col("n").cast("long").alias("n_items"),
        F.round(cov_n / var_x, 6).alias("slope"),
        F.round(sy / n - (cov_n / var_x) * sx / n, 6).alias("intercept"),
        F.round((cov_n * cov_n) / (var_x * var_y), 6).alias("r2"),
    )


GROUPED_OLS_ORACLE = """
WITH pts AS (
  SELECT p_brand,
         CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS x,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey
), s AS (
  SELECT p_brand,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x * y AS DECIMAL(38,0))) AS sxy,
         sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
         sum(CAST(y * y AS DECIMAL(38,0))) AS syy
  FROM pts GROUP BY p_brand
), d AS (
  SELECT p_brand, n AS n_items,
         CAST(n AS DOUBLE) AS nd,
         CAST(sx AS DOUBLE) / 100.0 AS sxd, CAST(sy AS DOUBLE) / 100.0 AS syd,
         CAST(sxy AS DOUBLE) / 10000.0 AS sxyd,
         CAST(sxx AS DOUBLE) / 10000.0 AS sxxd,
         CAST(syy AS DOUBLE) / 10000.0 AS syyd
  FROM s
)
SELECT p_brand, n_items,
       round((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 6) AS slope,
       round(syd / nd - (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
             * sxd / nd, 6) AS intercept,
       round((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)
             / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)), 6) AS r2
FROM d
"""
