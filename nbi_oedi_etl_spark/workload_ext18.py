"""Round-4 extension queries, wave 12: tokenizer-training APPLY step,
seasonal decomposition, and statistical hypothesis testing.

- ``bpe_apply_merges`` — the BPE APPLY step: the top-2 merges mined by
  ``bpe_merge_candidates`` are applied to the vocabulary with greedy
  leftmost-match semantics (the double-delimiter encoding makes plain
  ``replace()`` exactly BPE-greedy, including overlapping runs), closing
  the tokenizer-training loop: mine → apply → measure compression.
- ``daily_volume_seasonal_residuals`` — weekday-seasonal decomposition
  of daily event volume: seasonal component = weekday mean, residual =
  actual − seasonal. The day-of-week baseline every ingest monitor
  subtracts before alerting (the z-score/MAD detectors' seasonal-aware
  sibling).
- ``purchase_conversion_ab_test`` — two-proportion z-test between
  deterministic user segments (odd vs even user_id): the A/B
  significance primitive, computed from exact integer counts through an
  identical double-op order so even the z statistic value-hash-checks.

Oracle convention identical to workload.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table

# ------------------------------------------------- BPE apply step


def bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the top-2 mined BPE merges to the corpus vocabulary and
    measure per-word compression (top-20 words by frequency). The apply
    step is where tokenizer training meets the corpus at scale: mine
    (bpe_merge_candidates) ranks merges corpus-wide; apply rewrites the
    VOCABULARY (|vocab| rows, never the corpus — the Sennrich trick), and
    the merged unit counts weight back through word frequencies.

    Greedy-leftmost exactness: the word is encoded with DOUBLE-space
    separators and single-space edges (``␣w␣␣o␣␣r␣␣d␣``); a merge is
    ``replace(' x  y ', ' xy ')``. Plain replace() scans left-to-right
    over non-overlapping matches — on this encoding that IS BPE's greedy
    pass, including the ``a a a → (aa) a`` overlap case — and the
    single-spaced replacement reconstitutes double separators with its
    neighbors, so a later merge sees a well-formed encoding. Both
    engines' replace() share these semantics: exact.

    The 2 merge pairs are collected driver-side (2 rows — the bounded
    model-state pattern, same as k-means centroids) and inlined as
    literals; the oracle re-derives them in a CTE.
    """
    from nbi_oedi_etl_spark.workload_ext9 import bpe_merge_candidates

    merges = [
        r["pair"]
        for r in bpe_merge_candidates(spark, sf_dir)
        .where(F.col("rank") <= 2)
        .orderBy("rank")
        .collect()
    ]
    docs = read_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    spaced = F.concat(
        F.lit(" "),
        F.array_join(F.split(F.col("word"), "(?!^)"), "  "),
        F.lit(" "),
    )
    applied = spaced
    for pair in merges:
        x, y = pair[0], pair[1]
        applied = F.replace(
            applied, F.lit(f" {x}  {y} "), F.lit(f" {x}{y} ")
        )
    w = Window.orderBy(F.desc("freq"), F.asc("word"))
    return (
        words.select(
            "word",
            "freq",
            F.length("word").alias("n_chars"),
            F.size(F.split(F.trim(applied), "  ")).alias("n_units"),
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= 20)
    )


BPE_APPLY_ORACLE = r"""
WITH t AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
  FROM documents
), words AS (
  SELECT word, count(*) AS freq FROM t WHERE word <> '' GROUP BY word
), prs AS (
  SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, freq
  FROM (SELECT word, freq, unnest(range(1, length(word))) AS i
        FROM words WHERE length(word) >= 2)
), counts AS (
  SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count FROM prs GROUP BY pair
), ranked_pairs AS (
  SELECT pair, row_number() OVER (ORDER BY pair_count DESC, pair) AS prank
  FROM counts
), m1 AS (SELECT pair FROM ranked_pairs WHERE prank = 1),
m2 AS (SELECT pair FROM ranked_pairs WHERE prank = 2),
enc AS (
  SELECT word, freq,
         ' ' || array_to_string(
             list_transform(range(1, length(word) + 1),
                            i -> substr(word, CAST(i AS INTEGER), 1)),
             '  ') || ' ' AS spaced
  FROM words
), applied AS (
  SELECT word, freq,
         replace(
           replace(spaced,
                   ' ' || substr((SELECT pair FROM m1), 1, 1) || '  '
                       || substr((SELECT pair FROM m1), 2, 1) || ' ',
                   ' ' || (SELECT pair FROM m1) || ' '),
           ' ' || substr((SELECT pair FROM m2), 1, 1) || '  '
               || substr((SELECT pair FROM m2), 2, 1) || ' ',
           ' ' || (SELECT pair FROM m2) || ' ') AS s
  FROM enc
)
SELECT word, freq, length(word) AS n_chars,
       CAST(len(string_split(trim(s), '  ')) AS INTEGER) AS n_units,
       rank
FROM (
  SELECT word, freq, s,
         row_number() OVER (ORDER BY freq DESC, word) AS rank
  FROM applied
)
WHERE rank <= 20
"""


# ----------------------------------- weekday seasonal decomposition


def daily_volume_seasonal_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-seasonal decomposition of daily event volume: the seasonal
    component is the mean volume of that day-of-week across the window,
    the residual is actual − seasonal. Monitoring subtracts weekly
    seasonality before alerting — a Monday spike that is just "Mondays
    are busy" should not page anyone.

    Determinism: weekday = epoch_day % 7 (pure integer — engine weekday
    functions disagree on week start, the modulus doesn't); the seasonal
    mean and residual derive from integer counts through identical
    double ops, rounded once at the surface.

    Plan/scale: daily counts are one corpus aggregate; the weekday means
    are a 7-row table broadcast back. Same collapse-then-broadcast shape
    as the PSI/KL monitors.
    """
    ev = read_table(spark, sf_dir, "events").select(
        F.datediff(F.col("ts"), F.lit("1970-01-01")).alias("epoch_day")
    )
    daily = ev.groupBy("epoch_day").agg(F.count(F.lit(1)).alias("n"))
    daily = daily.withColumn("weekday", F.col("epoch_day") % 7)
    wk = daily.groupBy("weekday").agg(
        F.sum("n").alias("wn"), F.count(F.lit(1)).alias("wd")
    )
    out = daily.join(F.broadcast(wk), "weekday")
    seasonal = F.col("wn").cast("double") / F.col("wd")
    return out.select(
        "epoch_day",
        "weekday",
        "n",
        F.round(seasonal, 6).alias("seasonal_mean"),
        F.round(F.col("n") - seasonal, 6).alias("residual"),
    )


SEASONAL_RESIDUALS_ORACLE = """
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', ts) AS epoch_day,
         count(*) AS n
  FROM events GROUP BY 1
), wk AS (
  SELECT epoch_day % 7 AS weekday,
         CAST(sum(n) AS BIGINT) AS wn, count(*) AS wd
  FROM daily GROUP BY 1
)
SELECT d.epoch_day, d.epoch_day % 7 AS weekday, d.n,
       round(CAST(w.wn AS DOUBLE) / w.wd, 6) AS seasonal_mean,
       round(d.n - CAST(w.wn AS DOUBLE) / w.wd, 6) AS residual
FROM daily d JOIN wk w ON w.weekday = d.epoch_day % 7
"""


# ------------------------------------------ two-proportion z-test


def purchase_conversion_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test of purchase conversion between deterministic
    user segments (odd vs even user_id — the hash-bucket assignment of a
    real A/B system): z = (p1−p2)/√(p̂(1−p̂)(1/n1+1/n2)) with p̂ the
    pooled rate. The significance gate every experimentation platform
    computes; here from exact integer counts through one fixed double-op
    order, so the statistic itself value-hash-checks (same discipline as
    burstiness/covariance: ints → identical IEEE ops → round once).

    Plan/scale: the corpus collapses to 4 counters in one aggregate;
    everything after is constant-sized.
    """
    ev = read_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2 == 1).alias("seg_a"),
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
    )
    agg = ev.agg(
        F.sum(F.when(F.col("seg_a"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("seg_a"), F.col("is_purchase")).otherwise(0)).alias("x1"),
        F.sum(F.when(~F.col("seg_a"), 1).otherwise(0)).alias("n2"),
        F.sum(F.when(~F.col("seg_a"), F.col("is_purchase")).otherwise(0)).alias("x2"),
    )
    # nullif guards an empty segment (all traffic in one bucket): the
    # rate and the test statistic are undefined (NULL), not an ANSI
    # DIVIDE_BY_ZERO abort
    n1 = F.nullif(F.col("n1").cast("double"), F.lit(0.0))
    n2 = F.nullif(F.col("n2").cast("double"), F.lit(0.0))
    p1 = F.col("x1").cast("double") / n1
    p2 = F.col("x2").cast("double") / n2
    pooled = (F.col("x1") + F.col("x2")).cast("double") / F.nullif(
        (F.col("n1") + F.col("n2")).cast("double"), F.lit(0.0)
    )
    z = (p1 - p2) / F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / n1 + F.lit(1.0) / n2)
    )
    zr = F.round(z, 6)
    return agg.select(
        "n1",
        "x1",
        "n2",
        "x2",
        F.round(p1, 6).alias("rate_a"),
        F.round(p2, 6).alias("rate_b"),
        zr.alias("z_score"),
        (F.abs(zr) > 1.96).alias("significant_95"),
    )


AB_TEST_ORACLE = """
WITH ev AS (
  SELECT user_id % 2 = 1 AS seg_a,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
  FROM events
), agg AS (
  SELECT CAST(sum(CASE WHEN seg_a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN seg_a THEN is_purchase ELSE 0 END) AS BIGINT) AS x1,
         CAST(sum(CASE WHEN NOT seg_a THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN NOT seg_a THEN is_purchase ELSE 0 END) AS BIGINT) AS x2
  FROM ev
)
SELECT n1, x1, n2, x2,
       round(CAST(x1 AS DOUBLE) / nullif(n1, 0), 6) AS rate_a,
       round(CAST(x2 AS DOUBLE) / nullif(n2, 0), 6) AS rate_b,
       round((CAST(x1 AS DOUBLE) / nullif(n1, 0) - CAST(x2 AS DOUBLE) / nullif(n2, 0))
             / sqrt(CAST(x1 + x2 AS DOUBLE) / nullif(n1 + n2, 0)
                    * (1.0 - CAST(x1 + x2 AS DOUBLE) / nullif(n1 + n2, 0))
                    * (1.0 / nullif(n1, 0) + 1.0 / nullif(n2, 0))), 6) AS z_score,
       abs(round((CAST(x1 AS DOUBLE) / nullif(n1, 0) - CAST(x2 AS DOUBLE) / nullif(n2, 0))
             / sqrt(CAST(x1 + x2 AS DOUBLE) / nullif(n1 + n2, 0)
                    * (1.0 - CAST(x1 + x2 AS DOUBLE) / nullif(n1 + n2, 0))
                    * (1.0 / nullif(n1, 0) + 1.0 / nullif(n2, 0))), 6)) > 1.96 AS significant_95
FROM agg
"""
