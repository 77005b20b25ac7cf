"""Round-4 extension queries, wave 14: batch model inference, model
calibration auditing, and categorical independence testing.

- ``quality_classifier_inference`` — batch scoring of a linear
  classifier (logistic head) over the embedding corpus: THE
  quality-classifier pass of every LLM data pipeline (fasttext-style
  filters, reward-model gating) in its Spark-native shape — broadcast
  weights, map-only scoring, no shuffle until the decision aggregate.
- ``classifier_calibration_bins`` — calibration audit of those scores
  against the embeddings' labels: per score-decile, predicted-vs-actual
  positive rate (the reliability-diagram table). Model EVAL as a
  DataFrame op.
- ``lang_source_chi2`` — χ² test of independence between document
  language and source: the categorical drift/contingency audit beside
  the numeric PSI and the two-proportion z-test.

Oracle convention identical to workload.py; float determinism per the
established recipes (HOF-fold dot products; per-cell terms rounded once
into DECIMAL before the order-free sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table

# ------------------------------------------- batch model inference


def _weight_expr(i_col):
    """Deterministic pseudo-random weight for dimension i: the shared
    md5→60-bit bridge scaled to [-0.5, 0.5) — reproducible in any engine,
    the fixture standing in for trained parameters."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit("w|"), i_col.cast("string"))), 1, 15), 16, 10).cast(
        "bigint"
    )
    return (h.cast("double") / F.lit(float(2**60))) - F.lit(0.5)


def quality_classifier_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every embedding with a fixed linear classifier head:
    logit = w·x + b, score = sigmoid(logit), keep = score ≥ 0.5 — the
    batch-inference pass a quality filter runs over a 100 TB corpus.
    Weights are md5-derived constants (the deterministic stand-in for a
    trained head; same bridge as every portable fixture).

    Plan/scale: the weights are a deterministic EXPRESSION of the
    dimension index, so scoring needs no weight join at all — in-row
    posexplode, codegen multiply-add, one vec_id exchange to collapse
    the dot product. With externally-trained weights the same plan adds
    one dim-sized broadcast; nothing else shuffles either way.

    Exactness: per-dim products quantize once to the 1e-9 grid (native
    floor, the covariance recipe) and sum as exact BIGINTs; the logit is
    reconstructed from the exact sum, and sigmoid runs on that identical
    double in both engines before round(6).
    """
    emb = read_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "x"),
    )
    w = _weight_expr(F.col("i"))
    q = F.floor(F.col("x") * w * F.lit(1000000000.0) + F.lit(0.5)).cast("bigint")
    scored = dims.groupBy("vec_id", "label").agg(F.sum(q).alias("k"))
    logit = F.col("k").cast("double") / F.lit(1000000000.0) + F.lit(0.1)  # bias
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return scored.select(
        "vec_id",
        "label",
        F.round(logit, 6).alias("logit"),
        F.round(score, 6).alias("score"),
        (F.round(score, 6) >= 0.5).alias("keep"),
    )


CLASSIFIER_INFERENCE_ORACLE = """
WITH dims AS (
  SELECT vec_id, label, CAST(i - 1 AS INTEGER) AS i,
         CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS x
  FROM (SELECT vec_id, label, embedding,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings)
), wdims AS (
  SELECT vec_id, label, x,
         CAST(('0x' || substring(md5('w|' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
              AS DOUBLE) / 1152921504606846976.0 - 0.5 AS w
  FROM dims
), scored AS (
  SELECT vec_id, label,
         CAST(sum(CAST(floor(x * w * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS k
  FROM wdims GROUP BY vec_id, label
)
SELECT vec_id, label,
       round(CAST(k AS DOUBLE) / 1000000000.0 + 0.1, 6) AS logit,
       round(1.0 / (1.0 + exp(-(CAST(k AS DOUBLE) / 1000000000.0 + 0.1))), 6)
         AS score,
       round(1.0 / (1.0 + exp(-(CAST(k AS DOUBLE) / 1000000000.0 + 0.1))), 6)
         >= 0.5 AS keep
FROM scored
"""


# --------------------------------------------- calibration audit


def classifier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram table for the classifier scores: decile-bin the
    scores, compare mean predicted score against the actual positive
    rate (label = 1) per bin — the calibration audit run before trusting
    a filter threshold corpus-wide.

    Exactness: bins come from the ROUNDED score (engine-stable);
    mean-score numerators sum the 6-dp scores as exact DECIMAL; rates
    derive from integer counts. Plan: inference output (one exchange) →
    one 10-row aggregate.
    """
    scores = quality_classifier_inference(spark, sf_dir).select(
        "score", (F.col("label") == 1).cast("int").alias("is_pos")
    )
    bin_ = F.least(F.floor(F.col("score") * 10).cast("int"), F.lit(9))
    return (
        scores.groupBy(bin_.alias("score_bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("is_pos").alias("n_pos"),
            F.sum(F.col("score").cast("decimal(10,6)")).alias("_ssum"),
        )
        .select(
            "score_bin",
            "n",
            "n_pos",
            F.round(F.col("_ssum").cast("double") / F.col("n"), 6).alias(
                "mean_score"
            ),
            F.round(F.col("n_pos").cast("double") / F.col("n"), 6).alias(
                "actual_pos_rate"
            ),
        )
    )


CALIBRATION_ORACLE = """
WITH dims AS (
  SELECT vec_id, label, CAST(i - 1 AS INTEGER) AS i,
         CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS x
  FROM (SELECT vec_id, label, embedding,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings)
), wdims AS (
  SELECT vec_id, label, x,
         CAST(('0x' || substring(md5('w|' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
              AS DOUBLE) / 1152921504606846976.0 - 0.5 AS w
  FROM dims
), scored AS (
  SELECT vec_id, label,
         CAST(sum(CAST(floor(x * w * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS k
  FROM wdims GROUP BY vec_id, label
), s AS (
  SELECT round(1.0 / (1.0 + exp(-(CAST(k AS DOUBLE) / 1000000000.0 + 0.1))), 6)
           AS score,
         CASE WHEN label = 1 THEN 1 ELSE 0 END AS is_pos
  FROM scored
)
SELECT least(CAST(floor(score * 10) AS INTEGER), 9) AS score_bin,
       count(*) AS n,
       CAST(sum(is_pos) AS BIGINT) AS n_pos,
       round(CAST(sum(CAST(score AS DECIMAL(10,6))) AS DOUBLE) / count(*), 6)
         AS mean_score,
       round(CAST(sum(is_pos) AS DOUBLE) / count(*), 6) AS actual_pos_rate
FROM s
GROUP BY 1
"""


# ---------------------------------------- chi-square independence


def lang_source_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² test of independence between document language and source:
    χ² = Σ_cells (o·N − r·c)² / (r·c·N) — the contingency-table audit
    (is the language mix independent of the ingest source?). Completes
    the statistical-testing family: PSI (numeric drift), two-proportion
    z (binary rates), χ² (categorical independence).

    Exactness: the per-cell term's numerator (o·N − r·c)² and denominator
    r·c·N are exact BIGINT products; each cell's double quotient rounds
    once to 9 decimals into DECIMAL, and the cell sum — the only
    order-sensitive reduction — is exact decimal. Degrees of freedom are
    integer arithmetic.

    Plan/scale: one (lang, source) grouped count collapses the corpus;
    margins and the statistic are contingency-table-sized.
    """
    d = read_table(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rows_m = cells.groupBy("lang").agg(F.sum("o").alias("r"))
    cols_m = cells.groupBy("source").agg(F.sum("o").alias("c"))
    n_total = d.count()
    term = (
        (
            (F.col("o") * n_total - F.col("r") * F.col("c"))
            * (F.col("o") * n_total - F.col("r") * F.col("c"))
        ).cast("double")
        / (F.col("r") * F.col("c")).cast("double")
        / F.lit(float(n_total))
    )
    terms = (
        cells.join(F.broadcast(rows_m), "lang")
        .join(F.broadcast(cols_m), "source")
        .select(F.round(term, 9).cast("decimal(18,9)").alias("t9"))
    )
    n_langs = rows_m.count()
    n_sources = cols_m.count()
    dof = (n_langs - 1) * (n_sources - 1)
    return terms.agg(
        F.round(F.sum("t9").cast("double"), 6).alias("chi2"),
        F.lit(dof).cast("long").alias("dof"),
        F.lit(n_total).cast("long").alias("n_docs"),
    )


CHI2_ORACLE = """
WITH cells AS (
  SELECT lang, source, count(*) AS o FROM documents GROUP BY lang, source
), rm AS (
  SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY lang
), cm AS (
  SELECT source, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY source
), n AS (
  SELECT count(*) AS total FROM documents
), terms AS (
  SELECT CAST(round(
           CAST((cells.o * n.total - rm.r * cm.c)
                * (cells.o * n.total - rm.r * cm.c) AS DOUBLE)
           / CAST(rm.r * cm.c AS DOUBLE) / CAST(n.total AS DOUBLE), 9)
         AS DECIMAL(18,9)) AS t9
  FROM cells
  JOIN rm USING (lang)
  JOIN cm USING (source)
  CROSS JOIN n
)
SELECT round(CAST(sum(t9) AS DOUBLE), 6) AS chi2,
       CAST((SELECT count(*) FROM rm) - 1 AS BIGINT)
         * ((SELECT count(*) FROM cm) - 1) AS dof,
       CAST((SELECT total FROM n) AS BIGINT) AS n_docs
FROM terms
"""
