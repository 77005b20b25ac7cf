"""Round-4 extension queries: retrieval scoring, embedding compression,
and Unicode normalization — three training/RAG-pipeline operators that
round out the text and embedding families. Oracle convention identical to
workload.py: every query has a DuckDB twin with column names aliased
identically on both sides.

Scale posture (SCALE.md): BM25 reuses the TF-IDF stage shapes (one fact
shuffle + a broadcast-back of the tiny df table); quantization is one
window + one aggregate ON THE SAME KEY (the second stage reuses the
first's hash partitioning — no extra exchange); normalization is a
map-only Arrow-batched pandas_udf.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table


# --------------------------------------------------- BM25 retrieval scoring

def doc_bm25_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) top-3 terms per document — the standard
    retrieval scorer (Robertson & Zaragoza 2009, public formula) a RAG
    pipeline runs next to TF-IDF. idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
    the non-negative variant.

    Plan: same shape as doc_tfidf_top_terms — tokenize/tf is the only
    corpus-wide shuffle; df and the (N, avgdl) scalars aggregate to tiny
    tables that broadcast back; top-3 is one window on doc_id. The double
    formula is written in IDENTICAL operation order in both engines, so
    round(...,6) is cross-engine-stable (same convention as TF-IDF)."""
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
    score = idf * (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (F.lit(1.0) - b + b * (F.col("dl") / avgdl)))
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(scalars))
        .select("doc_id", "term", "tf", "df", F.round(score, 6).alias("bm25"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("bm25"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", "rank", "term", "tf", "df", "bm25")
    )


BM25_ORACLE = r"""
WITH t AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents
), toks AS (
  SELECT doc_id, term FROM t WHERE term <> ''
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), s AS (
  SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dl
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         round(
           ln(1.0 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf * (1.2 + 1)
              / (tf.tf + 1.2 * (1.0 - 0.75
                                + 0.75 * (dl.dl / (s.total_dl / s.n_docs))))),
           6) AS bm25
  FROM tf
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN dfreq ON dfreq.term = tf.term
  CROSS JOIN s
), ranked AS (
  SELECT doc_id, term, tf, df, bm25,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY bm25 DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, rank, term, tf, df, bm25 FROM ranked WHERE rank <= 3
"""


# ------------------------------------------- int8 embedding quantization

def embedding_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization — the standard ANN-index
    compression step (scale = max|x|/127, q_i = round(x_i/scale)) plus the
    reconstruction-error audit a pipeline keeps next to it. Rounding is
    written as floor(x/s + 0.5) in BOTH engines so no engine-specific
    round-half mode can diverge; the squared-error sum accumulates in
    decimal (order-independent), same as embedding_norm_stats.

    Plan: explode → window max ON vec_id → aggregate ON vec_id: the
    aggregate reuses the window's hash partitioning, so the whole query is
    ONE exchange. Map-only per element otherwise — at 100 TB of vectors
    this is the linear pass it must be."""
    emb = read_table(spark, sf_dir, "embeddings")
    x = F.col("x").cast("double")
    w = Window.partitionBy("vec_id")
    e = emb.select("vec_id", F.explode("embedding").alias("x")).select(
        "vec_id",
        x.alias("x"),
        (F.greatest(F.max(F.abs(x)).over(w), F.lit(1e-12)) / 127).alias("s"),
    )
    q = F.floor(F.col("x") / F.col("s") + F.lit(0.5))
    err = F.col("x") - q * F.col("s")
    return (
        e.select("vec_id", "s", q.alias("q"), err.alias("err"))
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("dim"),
            F.round(F.max("s"), 9).alias("scale"),
            F.sum(F.abs("q")).cast("bigint").alias("q_l1"),
            F.max(F.abs("q")).cast("bigint").alias("q_max"),
            F.round(
                F.sum((F.col("err") * F.col("err")).cast("decimal(38,20)")).cast(
                    "double"
                ),
                9,
            ).alias("sq_err"),
        )
    )


INT8_QUANT_ORACLE = """
WITH e AS (
  SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x FROM embeddings
), s AS (
  SELECT vec_id, x,
         greatest(max(abs(x)) OVER (PARTITION BY vec_id), 1e-12) / 127 AS s
  FROM e
), q AS (
  SELECT vec_id, s, floor(x/s + 0.5) AS q, x - floor(x/s + 0.5)*s AS err
  FROM s
)
SELECT vec_id, CAST(count(*) AS INTEGER) AS dim,
       round(max(s), 9) AS scale,
       CAST(sum(abs(q)) AS BIGINT) AS q_l1,
       CAST(max(abs(q)) AS BIGINT) AS q_max,
       round(CAST(sum(CAST(err*err AS DECIMAL(38,20))) AS DOUBLE), 9) AS sq_err
FROM q
GROUP BY vec_id
"""


# ------------------------------------------- Unicode NFC normalization

def doc_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization parity across engines — the first step of
    any text-dedup pipeline (visually identical strings must hash
    identically; 'e' + COMBINING ACUTE vs precomposed 'é' is the classic
    miss). A decomposed suffix is appended to every document so the
    normalizer provably has work to do, then Python's unicodedata (a
    vectorized Arrow-batched pandas_udf — the idiomatic surface for
    JVM-unavailable libraries) must agree byte-for-byte with DuckDB's
    nfc_normalize: the md5 of the normalized text is the value check.

    Map-only, no shuffle; the UDF sees Arrow batches, never Python rows."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(col: pd.Series) -> pd.Series:
        import unicodedata

        # null-safe: a NULL document yields NULL (SQL concat/normalize
        # semantics), matching DuckDB's nfc_normalize(NULL)
        return col.map(lambda s: None if s is None else unicodedata.normalize("NFC", s))

    docs = read_table(spark, sf_dir, "documents")
    # DECOMPOSED suffix: 'e' + U+0301 COMBINING ACUTE — NFC must fuse it
    raw = F.concat(F.col("text"), F.lit(" café"))
    out = docs.select("doc_id", raw.alias("raw")).select(
        "doc_id", "raw", nfc(F.col("raw")).alias("norm")
    )
    return out.select(
        "doc_id",
        (F.col("raw") != F.col("norm")).alias("changed"),
        F.length("raw").cast("int").alias("n_chars_raw"),
        F.length("norm").cast("int").alias("n_chars_norm"),
        F.md5(F.encode("norm", "utf-8")).alias("norm_md5"),
    )


UNICODE_NORMALIZE_ORACLE = """
WITH r AS (
  SELECT doc_id, text || ' cafe' || chr(769) AS raw FROM documents
), n AS (
  SELECT doc_id, raw, nfc_normalize(raw) AS norm FROM r
)
SELECT doc_id,
       raw <> norm AS changed,
       CAST(length(raw) AS INTEGER) AS n_chars_raw,
       CAST(length(norm) AS INTEGER) AS n_chars_norm,
       md5(norm) AS norm_md5
FROM n
"""
