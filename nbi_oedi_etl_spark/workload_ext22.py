"""Round-4 extension queries, wave 16: exact set-similarity join via
prefix filtering, Welch's t-test, and truncated-EWMA anomaly baselines.

- ``doc_jaccard_prefix_join`` — EXACT Jaccard ≥ τ similarity join
  using prefix filtering (the PPJoin family's core idea, public
  literature): order each document's shingle set by global rarity; any
  pair with J ≥ τ must share a token within each side's first
  n − ⌈τ·n⌉ + 1 tokens, so candidate generation is an equi-join on
  prefix tokens — complete (no LSH false negatives) yet never
  all-pairs. The guaranteed-recall counterpart to MinHash-LSH.
- ``event_value_welch_ttest`` — Welch's unequal-variance t-test on
  mean event value between two event types: completes the testing
  family (z: proportions, χ²: categorical, t: means).
- ``event_type_ewma_daily`` — 14-day truncated exponentially-weighted
  moving average of daily event counts per type, with the
  observed/EWMA anomaly ratio — the smoothed-baseline monitor beside
  the weekday seasonal residuals.

Oracle convention identical to workload.py. Float determinism: weights
α(1−α)^j are EXACT decimal literals (3·7^j/10^(j+1)); count×weight
products and their sums stay in exact DECIMAL; doubles appear only in
final single divisions of identical exact quantities.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table

# ------------------------------- exact Jaccard join, prefix filtering

_TAU = 0.5


def word_trigram_rows(d: DataFrame) -> DataFrame:
    """(doc_id, s) rows of word 3-gram shingles in the CODEGEN
    formulation: tokenize → posexplode → lead-window next-token
    alignment → concat — the string-shingle twin of
    operators/dedup.shingle_hashes (interpreted transform/slice HOFs
    measured ~10× slower on this corpus; see that docstring)."""
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    idx = d.select("doc_id", F.posexplode(toks).alias("pos", "w"))
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    return (
        idx.withColumn("w2", F.lead("w", 1).over(wdoc))
        .withColumn("w3", F.lead("w", 2).over(wdoc))
        .filter(F.col("w3").isNotNull())
        .select("doc_id", F.concat_ws(" ", "w", "w2", "w3").alias("s"))
    )


def doc_jaccard_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs of documents with exact 3-gram-shingle Jaccard ≥ 0.5,
    found WITHOUT an all-pairs product and WITHOUT LSH's probabilistic
    misses: prefix filtering.

    Each doc's distinct shingles are ranked by global document
    frequency (rarest first; ties by token). A pair with
    |A∩B|/|A∪B| ≥ τ satisfies |A∩B| ≥ ⌈τ·|A|⌉, so A's first
    |A| − ⌈τ·|A|⌉ + 1 rarest tokens must hit the intersection — i.e.
    every qualifying pair shares at least one PREFIX token of both
    sides. Candidates = equi-join on prefix tokens; exact intersection
    counts verify only those.

    Plan/scale: the rank table is vocabulary-sized (broadcast); the
    candidate join is keyed by prefix token — rarest-first ordering
    makes those buckets the SMALLEST document-frequency buckets in the
    corpus, so fan-out stays bounded where a common-token join would
    explode. Verification joins candidates against PACKED per-doc token
    arrays and intersects with codegen array_intersect — O(candidates)
    rows, never the candidate×doc_len token multiset. The oracle is the
    brute-force all-pairs Jaccard — result sets must be identical,
    which is exactly the completeness theorem under test. (Next lever
    at higher duplicate rates: PPJoin's positional filter on the
    matched prefix offsets.)

    Exactness: sizes and intersections are integers; jaccard is one
    double division rounded to 6.
    """
    d = read_table(spark, sf_dir, "documents")
    sh = word_trigram_rows(d).distinct()
    # global rarity rank: vocabulary-sized, single bounded window. The
    # integer rank then REPLACES the string shingle as the token id —
    # every downstream join keys on an int, not a 3-word string.
    df_rank = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("rnk", F.row_number().over(Window.orderBy("df", "s")))
        .select("s", "rnk")
    )
    # the shingle explode feeds five consumers (rank build, prefix,
    # both verify sides, sizes) — materialize it once, not 5 scans
    ranked = sh.join(F.broadcast(df_rank), "s").select("doc_id", "rnk").cache()
    sz = ranked.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # prefix = the (n - ceil(tau*n) + 1) rarest tokens of each doc
    wdoc = Window.partitionBy("doc_id").orderBy("rnk")
    prefix = (
        ranked.withColumn("pos", F.row_number().over(wdoc))
        .join(F.broadcast(sz), "doc_id")
        .filter(F.col("pos") <= F.col("n") - F.ceil(F.lit(_TAU) * F.col("n")) + 1)
        .select("doc_id", "rnk", "n")
    )
    # length filter: J >= tau forces tau·|B| <= |A| <= |B|/tau — prunes
    # size-incompatible candidates before the verify join (PPJoin's
    # standard companion filter)
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.rnk") == F.col("b.rnk"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.n") >= F.ceil(F.lit(_TAU) * F.col("b.n")))
            & (F.col("b.n") >= F.ceil(F.lit(_TAU) * F.col("a.n"))),
        )
        .select(F.col("a.doc_id").alias("u"), F.col("b.doc_id").alias("v"))
        .distinct()
    )
    # verify on PACKED token arrays, not an exploded token join: each
    # candidate row computes |A∩B| via codegen array_intersect over two
    # doc-length int arrays — O(candidates) rows instead of the
    # O(candidates × doc_len) pair-token multiset a re-join would shuffle
    packs = ranked.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("rnk")).alias("arr"), F.count(F.lit(1)).alias("n")
    )
    pu = packs.select(F.col("doc_id").alias("u"), F.col("arr").alias("arr_u"), F.col("n").alias("nu"))
    pv = packs.select(F.col("doc_id").alias("v"), F.col("arr").alias("arr_v"), F.col("n").alias("nv"))
    withsets = cand.join(pu, "u").join(pv, "v")
    c = F.size(F.array_intersect("arr_u", "arr_v"))
    jac = c.cast("double") / (F.col("nu") + F.col("nv") - c).cast("double")
    return withsets.filter(jac >= _TAU).select(
        F.col("u").alias("doc_a"),
        F.col("v").alias("doc_b"),
        c.cast("long").alias("n_common"),
        F.round(jac, 6).alias("jaccard"),
    )


JACCARD_PREFIX_ORACLE = r"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(len(toks) - 2),
             i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS s
  FROM d
), sz AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT u AS doc_a, v AS doc_b, CAST(c AS BIGINT) AS n_common,
       round(CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = u
JOIN sz sb ON sb.doc_id = v
WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.5
"""


# ------------------------------------------------------ Welch t-test


def event_value_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test: does mean event value differ
    between 'purchase' and 'click'? t = (m₁−m₂)/√(v₁/n₁+v₂/n₂) with
    Welch–Satterthwaite degrees of freedom.

    Exactness: values quantize once to the 1e-6 grid (floor, the
    covariance recipe); Σq is BIGINT and Σq² DECIMAL(38,0) — both
    exact, overflow-proof at any corpus size — and every downstream
    double (means, sample variances, t, df) is the identical arithmetic
    expression of those exact sums in both engines, rounded once to 6.

    Plan/scale: a two-group filtered scan collapsing to one row per
    group — partial aggregation does all the work map-side.
    """
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    q = F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sq"),
        F.sum((q * q).cast("decimal(38,0)")).alias("sq2"),
    )

    def side(t: str, suffix: str) -> DataFrame:
        return g.filter(F.col("event_type") == t).select(
            F.col("n").alias("n" + suffix),
            F.col("sq").alias("sq" + suffix),
            F.col("sq2").alias("sq2" + suffix),
        )

    j = side("purchase", "1").crossJoin(side("click", "2"))
    m1 = F.col("sq1").cast("double") / F.lit(1e6) / F.col("n1").cast("double")
    m2 = F.col("sq2").cast("double") / F.lit(1e6) / F.col("n2").cast("double")
    # sample variance from exact sums: (Σq² − (Σq)²/n) / (n−1) / 1e12
    v1 = (
        (F.col("sq21").cast("double") - F.col("sq1").cast("double") * F.col("sq1").cast("double") / F.col("n1").cast("double"))
        / (F.col("n1") - 1).cast("double")
        / F.lit(1e12)
    )
    v2 = (
        (F.col("sq22").cast("double") - F.col("sq2").cast("double") * F.col("sq2").cast("double") / F.col("n2").cast("double"))
        / (F.col("n2") - 1).cast("double")
        / F.lit(1e12)
    )
    se2 = v1 / F.col("n1").cast("double") + v2 / F.col("n2").cast("double")
    t_stat = (m1 - m2) / F.sqrt(se2)
    dfw = (se2 * se2) / (
        (v1 / F.col("n1").cast("double")) * (v1 / F.col("n1").cast("double")) / (F.col("n1") - 1).cast("double")
        + (v2 / F.col("n2").cast("double")) * (v2 / F.col("n2").cast("double")) / (F.col("n2") - 1).cast("double")
    )
    return j.select(
        F.col("n1").cast("long").alias("n_purchase"),
        F.col("n2").cast("long").alias("n_click"),
        F.round(m1, 6).alias("mean_purchase"),
        F.round(m2, 6).alias("mean_click"),
        F.round(t_stat, 6).alias("t_stat"),
        F.round(dfw, 6).alias("welch_df"),
    )


WELCH_TTEST_ORACLE = """
WITH g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sq,
         sum(CAST(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)
                  * CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)
                  AS DECIMAL(38,0))) AS sq2
  FROM events WHERE event_type IN ('purchase', 'click')
  GROUP BY event_type
), p AS (SELECT n AS n1, sq AS sq1, sq2 AS sq21 FROM g WHERE event_type = 'purchase'),
c AS (SELECT n AS n2, sq AS sq2_, sq2 AS sq22 FROM g WHERE event_type = 'click'),
x AS (
  SELECT n1, n2,
         CAST(sq1 AS DOUBLE) / 1e6 / CAST(n1 AS DOUBLE) AS m1,
         CAST(sq2_ AS DOUBLE) / 1e6 / CAST(n2 AS DOUBLE) AS m2,
         (CAST(sq21 AS DOUBLE) - CAST(sq1 AS DOUBLE) * CAST(sq1 AS DOUBLE)
            / CAST(n1 AS DOUBLE)) / CAST(n1 - 1 AS DOUBLE) / 1e12 AS v1,
         (CAST(sq22 AS DOUBLE) - CAST(sq2_ AS DOUBLE) * CAST(sq2_ AS DOUBLE)
            / CAST(n2 AS DOUBLE)) / CAST(n2 - 1 AS DOUBLE) / 1e12 AS v2
  FROM p CROSS JOIN c
)
SELECT n1 AS n_purchase, n2 AS n_click,
       round(m1, 6) AS mean_purchase, round(m2, 6) AS mean_click,
       round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
       round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
             / ((v1 / n1) * (v1 / n1) / CAST(n1 - 1 AS DOUBLE)
                + (v2 / n2) * (v2 / n2) / CAST(n2 - 1 AS DOUBLE)), 6) AS welch_df
FROM x
"""


# --------------------------------------------- truncated EWMA monitor

# alpha(1-alpha)^j = 3·7^j / 10^(j+1): EXACT decimals, shared literals.
_EWMA_W = [(j, Decimal(3) * Decimal(7) ** j / Decimal(10) ** (j + 1)) for j in range(14)]


def event_type_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day truncated EWMA (α = 0.3) of daily event counts per event
    type, and the observed/EWMA anomaly ratio. The truncated-window
    formulation keeps the recursion finite: EWMA(d) =
    Σ_{j=0..13} w_j·cnt(d−j) / Σ_{j∈present} w_j, normalized over the
    lags actually observed so series edges stay unbiased.

    Plan/scale: the daily rollup collapses the corpus first; the lag
    fan-out is a broadcast join against the 14-row weight table onto
    the (type, day)-keyed rollup — per-day work is a constant 14 terms,
    and nothing beyond the daily aggregate shuffles.

    Exactness: counts are integers and weights exact decimals
    (3·7^j/10^(j+1) — no float pow in either engine), so every product
    and both sums are EXACT decimal arithmetic; the single double
    division happens on identical exact operands, rounded to 6.
    """
    w_df = spark.createDataFrame(
        [(j, w) for j, w in _EWMA_W], "j int, w decimal(18,16)"
    )
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # each daily cell contributes to targets day+j; keep only observed days
    contrib = (
        daily.crossJoin(F.broadcast(w_df))
        .select(
            "event_type",
            F.date_add(F.col("day"), F.col("j")).alias("tday"),
            (F.col("cnt") * F.col("w")).alias("term"),
            F.col("w"),
        )
    )
    tgt = daily.select("event_type", F.col("day").alias("tday"), F.col("cnt"))
    agg = (
        contrib.join(tgt.select("event_type", "tday"), ["event_type", "tday"])
        .groupBy("event_type", "tday")
        .agg(F.sum("term").alias("num"), F.sum("w").alias("den"))
    )
    ewma = F.col("num").cast("double") / F.col("den").cast("double")
    return (
        agg.join(tgt, ["event_type", "tday"])
        .select(
            "event_type",
            F.col("tday").alias("day"),
            F.col("cnt").cast("long").alias("n_events"),
            F.round(ewma, 6).alias("ewma"),
            F.round(F.col("cnt").cast("double") / ewma, 6).alias("anomaly_ratio"),
        )
    )


_EWMA_VALUES = ",\n         ".join(
    f"({j}, CAST('{w}' AS DECIMAL(18,16)))" for j, w in _EWMA_W
)

EWMA_ORACLE = f"""
WITH w(j, w) AS (
  VALUES {_EWMA_VALUES}
), daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
  FROM events GROUP BY 1, 2
), contrib AS (
  SELECT d.event_type, d.day + w.j * INTERVAL 1 DAY AS tday,
         CAST(d.cnt AS DECIMAL(38,16)) * w.w AS term, w.w
  FROM daily d CROSS JOIN w
), agg AS (
  SELECT c.event_type, CAST(c.tday AS DATE) AS tday,
         sum(c.term) AS num, sum(c.w) AS den
  FROM contrib c
  JOIN daily t ON t.event_type = c.event_type AND t.day = CAST(c.tday AS DATE)
  GROUP BY 1, 2
)
SELECT a.event_type, a.tday AS day,
       CAST(t.cnt AS BIGINT) AS n_events,
       round(CAST(a.num AS DOUBLE) / CAST(a.den AS DOUBLE), 6) AS ewma,
       round(CAST(t.cnt AS DOUBLE)
             / (CAST(a.num AS DOUBLE) / CAST(a.den AS DOUBLE)), 6)
         AS anomaly_ratio
FROM agg a JOIN daily t ON t.event_type = a.event_type AND t.day = a.tday
"""
