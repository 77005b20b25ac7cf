"""Document chunking with overlap — the context-window splitter every
LLM-training / RAG ingestion pipeline runs between cleaning and
tokenization (beyond reference scope; SURVEY.md §2.12 posture).

Semantics: fixed-size character windows of ``chunk_chars`` starting every
``chunk_chars - overlap_chars`` characters. A window is emitted only if it
adds new coverage — start positions run from 1 through
``max(1, len - overlap)`` — so a short tail that is already fully
contained in the previous window is never re-emitted, and every document
(even an empty one) yields at least one chunk.

Spark-first: the start positions are a ``sequence()`` literal exploded
JVM-side, the slice is ``substring`` — the whole operator is three
codegen'd expressions, no UDF, no shuffle (explode is a narrow map). At
100 TB the only scale question is output amplification (~len/stride rows
per doc), which is the point: chunking is embarrassingly parallel and
should never cost a shuffle. Keep the explode early-projected (doc_id +
text only) so the blow-up carries no dead columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 500,
    overlap_chars: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode each document into overlapping character windows.

    Returns (id, chunk_id, chunk_start, chunk_text, chunk_len) — chunk_id
    is the 0-based window index, chunk_start the 1-based char offset.
    """
    if overlap_chars >= chunk_chars:
        raise ValueError("overlap_chars must be < chunk_chars")
    stride = chunk_chars - overlap_chars
    n: Column = F.length(F.col(text_col))
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), n - F.lit(overlap_chars)), F.lit(stride)
    )
    return (
        df.select(id_col, text_col)
        .select(id_col, text_col, F.explode(starts).alias("chunk_start"))
        .select(
            id_col,
            ((F.col("chunk_start") - 1) / stride).cast("long").alias("chunk_id"),
            "chunk_start",
            F.expr(
                f"substring({text_col}, chunk_start, {chunk_chars})"
            ).alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text"))
    )
