"""Round-4 extension queries, wave 8: information-theoretic quality
signals, temporal behavior statistics, retrieval ranking, and
engagement rollups.

- ``doc_token_entropy`` — Shannon entropy of each document's token
  distribution: the information-density quality signal (low-entropy
  docs are repetitive/template spam; complements lexical diversity's
  type-token view with a frequency-weighted one).
- ``user_interarrival_stats`` — per-user inter-event gap statistics
  (mean, std, burstiness (σ−μ)/(σ+μ), Goh & Barabási 2008): the
  temporal-behavior profile used for bot/automation detection and
  session-model calibration.
- ``bm25_search_ranking`` — top-20 documents for a fixed multi-term
  query under Okapi BM25: the SEARCH surface of the retrieval scorer
  (doc_bm25_top_terms ranks terms per doc; this ranks docs per query —
  what a RAG retriever actually executes).
- ``daily_active_wau`` — DAU and trailing-7-day WAU per active day:
  the engagement rollup, executed with the same bin-claim trick as the
  range join (each active day claims the 7 target days it contributes
  to) instead of a per-day range scan.

Oracle convention identical to workload.py; float determinism per the
established recipe (ln terms rounded once into DECIMAL, exact integer/
decimal interiors, doubles only in final rounded columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table

# ------------------------------------------- Shannon token entropy


def doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of the token distribution per document:
    H = ln(n) − (Σ_t c_t·ln(c_t))/n. Low entropy flags repetitive /
    templated documents a length filter misses — the frequency-weighted
    complement of type-token diversity (doc_lexical_diversity).

    Exactness: ln(count) rounds once to 9 decimals; both the Σ c·ln9(c)
    reduction and the n·ln9(n) term stay in exact DECIMAL; the single
    final divide runs in doubles before round(6).

    Plan/scale: one (doc_id, term) count aggregate — the per-doc rollup
    reuses its partitioning (subset key). No joins, no broadcast needed.
    """
    docs = read_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: t != "")
        ).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))

    def ln9(col):
        return F.round(F.log(col.cast("double")), 9).cast("decimal(18,9)")

    per_doc = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.sum(F.col("c").cast("decimal(10,0)") * ln9(F.col("c"))).alias("_clnc"),
    )
    numerator = (
        F.col("n_tokens").cast("decimal(10,0)") * ln9(F.col("n_tokens"))
        - F.col("_clnc")
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.round(numerator.cast("double") / F.col("n_tokens"), 6).alias(
            "entropy_nats"
        ),
    )


TOKEN_ENTROPY_ORACLE = """
WITH terms AS (
  SELECT d.doc_id, t.term
  FROM documents d,
       LATERAL unnest(list_filter(string_split_regex(lower(d.text), '[^a-z]+'),
                                  x -> x != '')) AS t(term)
), tf AS (
  SELECT doc_id, term, count(*) AS c FROM terms GROUP BY doc_id, term
), per_doc AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         sum(CAST(c AS DECIMAL(10,0))
             * CAST(round(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(18,9))) AS clnc
  FROM tf GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round(CAST(CAST(n_tokens AS DECIMAL(10,0))
                  * CAST(round(ln(CAST(n_tokens AS DOUBLE)), 9) AS DECIMAL(18,9))
                  - clnc AS DOUBLE) / n_tokens, 6) AS entropy_nats
FROM per_doc
"""


# ------------------------------------- inter-arrival burstiness stats


def user_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap statistics: mean, standard deviation, and
    burstiness B = (σ−μ)/(σ+μ) (Goh & Barabási 2008) — B→−1 periodic
    (automation), B≈0 Poisson, B→1 bursty human. The temporal-behavior
    profile for bot detection and traffic-model calibration.

    Exactness: gaps are INTEGER seconds (epoch-microsecond difference
    floor-divided by 10⁶ — exact in both engines); Σg and Σg² accumulate
    as exact BIGINTs, the variance numerator n·Σg² − (Σg)² is exact
    integer arithmetic, and σ/μ/B run in IEEE doubles from identical
    integer inputs (long→double conversion and sqrt are both
    correctly-rounded, hence bit-identical) before round(6).

    Plan/scale: ONE user-keyed exchange serves the lag window and the
    per-user aggregate (same key). Users with <3 events are dropped
    (≥2 gaps needed for a std).
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us")
    gaps = ev.select(
        "user_id",
        (
            F.floor(F.col("us") / 1000000)
            - F.floor(F.lag("us", 1).over(w) / 1000000)
        ).alias("g"),
    ).where(F.col("g").isNotNull())
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("g").alias("sg"),
        F.sum(F.col("g") * F.col("g")).alias("sg2"),
    ).where(F.col("n_gaps") >= 2)
    mu = F.col("sg").cast("double") / F.col("n_gaps")
    sigma = (
        F.sqrt(
            (F.col("n_gaps") * F.col("sg2") - F.col("sg") * F.col("sg")).cast(
                "double"
            )
        )
        / F.col("n_gaps")
    )
    return agg.select(
        "user_id",
        "n_gaps",
        F.round(mu, 6).alias("mean_gap_s"),
        F.round(sigma, 6).alias("std_gap_s"),
        # nullif: all-identical timestamps give σ=μ=0 — burstiness is
        # undefined (NULL), not a 0/0 abort
        F.round((sigma - mu) / F.nullif(sigma + mu, F.lit(0.0)), 6).alias(
            "burstiness"
        ),
    )


INTERARRIVAL_ORACLE = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us FROM events
), gaps AS (
  SELECT user_id,
         us // 1000000
         - lag(us) OVER (PARTITION BY user_id ORDER BY us) // 1000000 AS g
  FROM ev
), agg AS (
  SELECT user_id, count(*) AS n_gaps,
         CAST(sum(g) AS BIGINT) AS sg,
         CAST(sum(g * g) AS BIGINT) AS sg2
  FROM gaps WHERE g IS NOT NULL GROUP BY user_id
  HAVING count(*) >= 2
)
SELECT user_id, n_gaps,
       round(CAST(sg AS DOUBLE) / n_gaps, 6) AS mean_gap_s,
       round(sqrt(CAST(n_gaps * sg2 - sg * sg AS DOUBLE)) / n_gaps, 6)
         AS std_gap_s,
       round((sqrt(CAST(n_gaps * sg2 - sg * sg AS DOUBLE)) / n_gaps
              - CAST(sg AS DOUBLE) / n_gaps)
             / nullif(sqrt(CAST(n_gaps * sg2 - sg * sg AS DOUBLE)) / n_gaps
                + CAST(sg AS DOUBLE) / n_gaps, 0.0), 6) AS burstiness
FROM agg
"""


# ----------------------------------------------- BM25 search ranking

_QUERY_TERMS = ("table", "stream", "join")


def bm25_search_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents for the fixed query {table, stream, join} under
    Okapi BM25 (k1=1.2, b=0.75, non-negative idf) — the SEARCH execution
    path of the retrieval scorer: what a RAG retriever runs per query
    (doc_bm25_top_terms is the indexing-side view). Per-term scores are
    rounded once to 9 decimals and summed in exact DECIMAL, so the doc
    score is order-free; ranking orders by (rounded score desc, doc_id)
    — total, engine-stable.

    Plan/scale: the query-term filter prunes the postings BEFORE any
    join (only docs containing a query term survive — the inverted-index
    access path); df/avgdl scalars broadcast; top-20 is a
    TakeOrderedAndProject, never a global sort.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scalars = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    k1, b = F.lit(1.2), F.lit(0.75)
    avgdl = F.col("total_dl") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    term_score = idf * (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (F.lit(1.0) - b + b * (F.col("dl") / avgdl)))
    )
    q = tf.where(F.col("term").isin(*_QUERY_TERMS))
    scored = (
        q.join(dl, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(scalars))
        .select(
            "doc_id",
            F.round(term_score, 9).cast("decimal(18,9)").alias("s9"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.round(F.sum("s9").cast("double"), 6).alias("bm25_score"),
        )
    )
    return scored.orderBy(F.desc("bm25_score"), F.asc("doc_id")).limit(20)


BM25_SEARCH_ORACLE = r"""
WITH toks AS (
  SELECT d.doc_id, t.term
  FROM documents d,
       LATERAL unnest(list_filter(string_split_regex(trim(lower(d.text)), '\s+'),
                                  x -> x != '')) AS t(term)
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), scalars AS (
  SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dl
), scored AS (
  SELECT tf.doc_id,
         count(*) AS n_terms_matched,
         round(CAST(sum(CAST(round(
             ln(1.0 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * (tf.tf * (1.2 + 1)
                / (tf.tf + 1.2 * (1.0 - 0.75
                                  + 0.75 * (dl.dl / (s.total_dl / s.n_docs))))),
             9) AS DECIMAL(18,9))) AS DOUBLE), 6) AS bm25_score
  FROM tf
  JOIN dl USING (doc_id)
  JOIN dfreq USING (term)
  CROSS JOIN scalars s
  WHERE tf.term IN ('table', 'stream', 'join')
  GROUP BY tf.doc_id
)
SELECT doc_id, n_terms_matched, bm25_score
FROM scored
ORDER BY bm25_score DESC, doc_id ASC
LIMIT 20
"""


# --------------------------------------------------- DAU / WAU rollup


def daily_active_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU and trailing-7-day WAU per active day — the engagement rollup.
    WAU is a windowed COUNT(DISTINCT) over a RANGE of days, which has no
    native distributed operator; the scale rewrite is the same bin-claim
    trick as the range join: each distinct (user, active day) claims the
    7 target days it contributes to, and WAU becomes a plain grouped
    COUNT(DISTINCT) on the claimed day — one shuffle, no per-day rescans,
    no 7-way self-union.

    Target days are restricted to days with ≥1 event (the observed grid),
    keeping both engines on the same day set. Integer/date arithmetic
    only: exact.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    active = ev.distinct()
    dau = active.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    claims = active.select(
        "user_id",
        F.explode(F.array(*[F.lit(i) for i in range(7)])).alias("i"),
        F.col("day"),
    ).select(
        "user_id",
        (F.col("day") + F.make_interval(days=F.col("i"))).alias("day"),
    )
    wau = (
        claims.join(dau.select("day"), "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return dau.join(wau, "day").select(
        F.col("day").cast("timestamp_ntz").alias("day"), "dau", "wau"
    )


DAU_WAU_ORACLE = """
WITH active AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), dau AS (
  SELECT day, count(DISTINCT user_id) AS dau FROM active GROUP BY day
), claims AS (
  SELECT user_id, day + i * INTERVAL 1 DAY AS day
  FROM (SELECT user_id, day, unnest(range(0, 7)) AS i FROM active)
), wau AS (
  SELECT c.day, count(DISTINCT c.user_id) AS wau
  FROM claims c
  WHERE c.day IN (SELECT day FROM dau)
  GROUP BY c.day
)
SELECT dau.day, dau.dau, wau.wau
FROM dau JOIN wau USING (day)
"""
