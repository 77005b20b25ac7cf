"""Round-11 wave: exact substring-level dedup (§2.12 extension).

The one near-dup modality the registry lacked: EXACT duplicate SPANS
across documents — the "Deduplicating Training Data Makes Language
Models Better" (Lee et al., 2022) recipe, whose published form builds a
corpus-wide suffix array and scans it for repeated substrings ≥ a
threshold. A literal suffix array is a single sorted structure no
executor can hold at 100 TB; the distributed re-expression here is the
SORTED SHINGLE SPINE: fixed-width token shingles carry their (doc, pos)
provenance through a shingle-keyed shuffle (the "sorted" part is the
hash-group, not a global sort), cross-doc duplicated shingles survive a
HAVING, and per-doc run-length grouping (gaps-and-islands on positions)
merges overlapping duplicated shingles back into maximal spans — never
an all-pairs comparison, never a global sort.

Scale/plan notes:
- the shingle spine shuffles once on the shingle value (production
  would shuffle on ``xxhash64(shingle)`` to keep shuffle rows narrow;
  the oracled spec keeps the string so DuckDB reproduces it exactly —
  the same trade as ``minhash_lsh_portable``);
- the duplicated-shingle filter is an aggregate with map-side partial
  distinct; its output (only shingles seen in ≥2 docs) is tiny relative
  to the corpus, and the join back is shingle-keyed (AQE broadcasts it
  when small);
- run-length grouping windows partition on doc_id with positions
  bounded by DOC LENGTH — per-doc, never hot-key (a single document is
  the parallelism floor of any span-level analysis).

Reference parity: no reference analogue (§2.12 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources import read_table

#: Shingle width in tokens — the seed length for span detection; spans
#: are maximal unions of overlapping duplicated shingles, so the minimum
#: detectable span is exactly this width.
SPAN_SHINGLE_TOKENS = 8

#: Minimum reported span length in tokens (the Lee et al. recipe uses 50
#: BPE tokens on web corpora; 16 suits the ~90-token test documents).
MIN_SPAN_TOKENS = 16


def doc_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-doc duplicated token spans per document: every
    position range whose ``SPAN_SHINGLE_TOKENS``-token shingles ALL
    occur in at least one other document, merged to maximal runs and
    reported when ≥ ``MIN_SPAN_TOKENS`` tokens. Output: (doc_id,
    start_pos, end_pos, span_tokens) with 0-based half-open token
    positions into the whitespace split.

    A doc wholly duplicated elsewhere reports one spine-to-spine span;
    a doc sharing only a boilerplate paragraph reports just that
    paragraph's range — the span grain is what lets a training pipeline
    CUT the duplicated substring instead of dropping the whole document
    (the measured win of the Lee et al. paper).
    """
    k = SPAN_SHINGLE_TOKENS
    d = (
        read_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
        .select(
            "doc_id",
            F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks"),
        )
        .where(F.size("toks") >= k)
    )
    sh = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(toks) - {k}),"
                f" i -> concat_ws(' ', slice(toks, i + 1, {k})))"
            )
        ).alias("pos", "s"),
    )
    dup = (
        sh.groupBy("s")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("s")
    )
    hits = sh.join(dup, "s").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        runs.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("start_pos"),
            (F.max("pos") + k).alias("end_pos"),
        )
        .select(
            "doc_id",
            F.col("start_pos").cast("long").alias("start_pos"),
            F.col("end_pos").cast("long").alias("end_pos"),
            (F.col("end_pos") - F.col("start_pos")).cast("long").alias("span_tokens"),
        )
        .where(F.col("span_tokens") >= MIN_SPAN_TOKENS)
    )


DOC_DUPLICATE_SPANS_ORACLE = rf"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
    AND len(regexp_split_to_array(trim(lower(text)), '\s+')) >= {SPAN_SHINGLE_TOKENS}
), sh AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(toks, i + 1, i + {SPAN_SHINGLE_TOKENS}), ' ') AS s
  FROM d, unnest(range(len(toks) - {SPAN_SHINGLE_TOKENS} + 1)) t(i)
), dup AS (
  SELECT s FROM sh GROUP BY s HAVING count(DISTINCT doc_id) >= 2
), hits AS (
  SELECT doc_id, pos FROM sh JOIN dup USING (s)
), runs AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hits
), spans AS (
  SELECT doc_id,
         CAST(min(pos) AS BIGINT) AS start_pos,
         CAST(max(pos) + {SPAN_SHINGLE_TOKENS} AS BIGINT) AS end_pos
  FROM runs GROUP BY doc_id, grp
)
SELECT doc_id, start_pos, end_pos,
       CAST(end_pos - start_pos AS BIGINT) AS span_tokens
FROM spans
WHERE end_pos - start_pos >= {MIN_SPAN_TOKENS}
"""
