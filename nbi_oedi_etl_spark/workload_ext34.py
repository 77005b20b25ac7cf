"""Round-10 wave: training-sequence packing (§2.12 extension).

The one LLM-pipeline step the registry lacked between chunking
(within-doc) and shard assignment (whole-doc routing): packing documents
into fixed token-budget TRAINING SEQUENCES. This implements the
concat-and-cut discipline most large-scale pipelines actually use —
concatenate documents in a deterministic order and cut every L tokens —
rather than bin-packing heuristics (first-fit-decreasing needs a
sequential scan over the corpus; concat-and-cut is one window cumsum,
embarrassingly scalable, and wastes no tokens to padding by
construction).

Reference parity: no reference analogue (§2.12 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources import read_table

#: Fixed token budget per training sequence.
PACK_TOKENS = 2048


def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document its place in the packed training stream:
    per ``source`` (the shard key — each source's stream packs
    independently, so the cumsum window is keyed, never global), docs
    concatenate in doc_id order and cut every ``PACK_TOKENS`` whitespace
    tokens. Output per doc: the sequence it STARTS in (``seq_id``), its
    token offset there, and how many sequences it spans (a doc larger
    than the budget legitimately spans several).

    Plan/scale: one keyed window cumsum (RANGE-equivalent ROWS frame on
    a unique key) — map-side token counting, single shuffle on
    ``source``. A hot source is exactly the regime
    ``operators/skew.running_sum`` two-passes; at testdata cardinality
    the naive keyed window is the right plan. Zero-token docs (null or
    whitespace-only text) are excluded — they contribute nothing to the
    stream and would otherwise alias their neighbor's offset.
    """
    d = read_table(spark, sf_dir, "documents")
    d = d.where(F.col("text").isNotNull() & (F.trim(F.col("text")) != "")).select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.floor(cum_before / PACK_TOKENS).alias("seq_id"),
        (cum_before % PACK_TOKENS).alias("offset_in_seq"),
        (
            F.floor((cum_before + F.col("n_tokens") - 1) / PACK_TOKENS)
            - F.floor(cum_before / PACK_TOKENS)
            + 1
        ).alias("seq_span"),
    )


PACK_SEQUENCES_ORACLE = rf"""
WITH d AS (
  SELECT doc_id, source,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
  FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
), c AS (
  SELECT doc_id, source, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM d
)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(cum_before / {PACK_TOKENS}) AS BIGINT) AS seq_id,
       CAST(cum_before % {PACK_TOKENS} AS BIGINT) AS offset_in_seq,
       CAST(floor((cum_before + n_tokens - 1) / {PACK_TOKENS})
            - floor(cum_before / {PACK_TOKENS}) + 1 AS BIGINT) AS seq_span
FROM c
"""
