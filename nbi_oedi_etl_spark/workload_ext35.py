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
    # "shared by >= 2 distinct docs" as min != max (r14, guide §2.3):
    # countDistinct planned as a TWO-exchange distinct aggregate whose
    # first shuffle carried the whole (s, doc_id) spine; min/max are
    # map-side partial-aggregable, so one exchange carries one row per
    # (partition, shingle). doc_id is the non-null table key, so
    # nd >= 2 <=> min(doc_id) != max(doc_id) exactly.
    dup = (
        sh.groupBy("s")
        .agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
        .where(F.col("d0") != F.col("d1"))
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


def doc_cut_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REPAIR half of substring-level dedup: cut every maximal
    duplicated span from all but its FIRST corpus occurrence and emit
    the cleaned text — what the Lee et al. pipeline actually writes out
    (cut the substring, keep the document).

    Keep-first rule, shingle grain: a position p in doc d is
    NON-CANONICAL when the shingle starting at p also occurs in some doc
    d' < d (min doc_id owns the occurrence — deterministic on any
    engine). Non-canonical positions merge to maximal runs exactly as in
    ``doc_duplicate_spans``; runs ≥ ``MIN_SPAN_TOKENS`` become cut
    ranges; the kept text is the ordered join of tokens outside every
    cut range. Docs with nothing to cut pass through with their
    normalized token stream intact, so the output is a full corpus
    replacement (one row per tokenizable doc).

    Plan/scale: the spine/HAVING/runs stages are the detection spec's;
    the cut APPLICATION is per-row array algebra (r14, guide §2.3/§2.4):
    cut ranges aggregate to one bounded array per affected doc and join
    doc-keyed (tiny side — AQE broadcasts it), and the kept text is a
    filter/transform over the doc's own token array. The previous shape
    posexploded EVERY token of the corpus and anti-joined on (doc_id,
    pos) — a full-corpus token shuffle plus a per-doc sort-collect —
    to compute something each row can answer locally; measured 4.5 s →
    the shingle spine's cost alone at sf0.1, and at 100 TB it removes
    the single widest exchange of the query (every token vs only the
    duplicated-span ranges).

    Membership contract (r11 self-review fix): docs SHORTER than the
    shingle width cannot carry a detectable span but are still corpus
    members — they pass through intact. Only shingle GENERATION is
    gated by the width; output membership is every tokenizable doc.
    """
    k = SPAN_SHINGLE_TOKENS
    d = (
        read_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
        .select(
            "doc_id",
            F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks"),
        )
    )
    sh = d.where(F.size("toks") >= k).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(toks) - {k}),"
                f" i -> concat_ws(' ', slice(toks, i + 1, {k})))"
            )
        ).alias("pos", "s"),
    )
    # nd >= 2 as min != max — same rewrite as the detection spec above:
    # drops the (s, doc_id) distinct pre-shuffle in favor of one
    # map-combined exchange (min is already needed as the owner).
    owner = sh.groupBy("s").agg(
        F.min("doc_id").alias("owner"), F.max("doc_id").alias("dmax")
    ).where(F.col("owner") != F.col("dmax"))
    noncanon = (
        sh.join(owner, "s")
        .where(F.col("doc_id") > F.col("owner"))
        .select("doc_id", "pos")
        .distinct()
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = noncanon.withColumn("grp", F.col("pos") - F.row_number().over(w))
    spans = (
        runs.groupBy("doc_id", "grp")
        .agg(F.min("pos").alias("start_pos"), (F.max("pos") + k).alias("end_pos"))
        .where(F.col("end_pos") - F.col("start_pos") >= MIN_SPAN_TOKENS)
    )
    ranges = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("start_pos", "end_pos")).alias("cuts")
    )
    # kept tokens = the doc's own array filtered by its (disjoint,
    # bounded) cut ranges — docs with no spans join null cuts and the
    # coalesce keeps every token. Array order IS position order, so the
    # joined text equals the old sort-collect of surviving (pos, tok).
    idx = F.transform(
        "toks", lambda tok, i: F.struct(i.alias("pos"), tok.alias("tok"))
    )
    kept_arr = F.filter(
        idx,
        lambda s: F.coalesce(
            ~F.exists(
                F.col("cuts"),
                lambda c: (s["pos"] >= c["start_pos"]) & (s["pos"] < c["end_pos"]),
            ),
            F.lit(True),
        ),
    )
    return d.join(ranges, "doc_id", "left").select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size(kept_arr)).cast("long").alias("cut_tokens"),
        F.array_join(F.transform(kept_arr, lambda s: s["tok"]), " ").alias(
            "kept_text"
        ),
    )


DOC_CUT_DUPLICATE_SPANS_ORACLE = rf"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
), sh AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(toks, i + 1, i + {SPAN_SHINGLE_TOKENS}), ' ') AS s
  FROM d, unnest(range(len(toks) - {SPAN_SHINGLE_TOKENS} + 1)) t(i)
  WHERE len(toks) >= {SPAN_SHINGLE_TOKENS}
), owner AS (
  SELECT s, min(doc_id) AS owner
  FROM sh GROUP BY s HAVING count(DISTINCT doc_id) >= 2
), noncanon AS (
  SELECT DISTINCT sh.doc_id, sh.pos
  FROM sh JOIN owner USING (s) WHERE sh.doc_id > owner.owner
), runs AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM noncanon
), spans AS (
  SELECT doc_id, min(pos) AS start_pos, max(pos) + {SPAN_SHINGLE_TOKENS} AS end_pos
  FROM runs GROUP BY doc_id, grp
  HAVING max(pos) + {SPAN_SHINGLE_TOKENS} - min(pos) >= {MIN_SPAN_TOKENS}
), cut_pos AS (
  SELECT DISTINCT doc_id, unnest(range(start_pos, end_pos)) AS pos
  FROM spans
), toks AS (
  SELECT doc_id, i AS pos, toks[i + 1] AS tok
  FROM d, unnest(range(len(toks))) t(i)
), kept AS (
  SELECT t.doc_id, count(*) AS kept,
         string_agg(t.tok, ' ' ORDER BY t.pos) AS kept_text
  FROM toks t LEFT JOIN cut_pos c
    ON t.doc_id = c.doc_id AND t.pos = c.pos
  WHERE c.doc_id IS NULL
  GROUP BY t.doc_id
)
SELECT d2.doc_id,
       CAST(len(d2.toks) AS BIGINT) AS n_tokens,
       CAST(len(d2.toks) - COALESCE(k.kept, 0) AS BIGINT) AS cut_tokens,
       COALESCE(k.kept_text, '') AS kept_text
FROM d d2 LEFT JOIN kept k ON d2.doc_id = k.doc_id
"""


#: The designated benchmark source — same convention as
#: workload_ext6.cross_source_contamination so the family composes.
BENCHMARK_SOURCE = "src0"


def benchmark_contamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-level benchmark decontamination — the third member of the
    decontamination family: ``cross_source_contamination`` scores docs
    (fraction of shingles in the benchmark), ``bloom_decontamination``
    does it at bounded broadcast size, and THIS spec answers WHERE the
    overlap sits, so a pipeline can CUT the contaminated span instead of
    dropping the document (the doc_cut_duplicate_spans discipline
    pointed at an eval set — the published span-grain decontamination
    recipe). Output: (doc_id, start_pos, end_pos, span_tokens) of every
    maximal run of benchmark-present shingles ≥ ``MIN_SPAN_TOKENS`` in
    every NON-benchmark document.

    Plan/scale: the benchmark's distinct shingle set broadcasts (an eval
    suite is MBs even at a 100 TB corpus — the ext6 argument); the
    corpus side is one shingle explode + the per-doc gaps-and-islands
    merge. Same maximal-run machinery as ``doc_duplicate_spans`` with
    the duplicated-shingle HAVING replaced by benchmark membership.
    """
    k = SPAN_SHINGLE_TOKENS
    d = (
        read_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
        .select(
            "doc_id",
            "source",
            F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks"),
        )
        .where(F.size("toks") >= k)
    )
    sh = d.select(
        "doc_id",
        "source",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(toks) - {k}),"
                f" i -> concat_ws(' ', slice(toks, i + 1, {k})))"
            )
        ).alias("pos", "s"),
    )
    bench = (
        sh.where(F.col("source") == BENCHMARK_SOURCE).select("s").distinct()
    )
    hits = (
        sh.where(F.col("source") != BENCHMARK_SOURCE)
        .join(F.broadcast(bench), "s")
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        runs.groupBy("doc_id", "grp")
        .agg(F.min("pos").alias("start_pos"), (F.max("pos") + k).alias("end_pos"))
        .select(
            "doc_id",
            F.col("start_pos").cast("long").alias("start_pos"),
            F.col("end_pos").cast("long").alias("end_pos"),
            (F.col("end_pos") - F.col("start_pos")).cast("long").alias("span_tokens"),
        )
        .where(F.col("span_tokens") >= MIN_SPAN_TOKENS)
    )


BENCHMARK_CONTAMINATION_SPANS_ORACLE = rf"""
WITH d AS (
  SELECT doc_id, source, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
    AND len(regexp_split_to_array(trim(lower(text)), '\s+')) >= {SPAN_SHINGLE_TOKENS}
), sh AS (
  SELECT doc_id, source, i AS pos,
         array_to_string(list_slice(toks, i + 1, i + {SPAN_SHINGLE_TOKENS}), ' ') AS s
  FROM d, unnest(range(len(toks) - {SPAN_SHINGLE_TOKENS} + 1)) t(i)
), bench AS (
  SELECT DISTINCT s FROM sh WHERE source = '{BENCHMARK_SOURCE}'
), hits AS (
  SELECT sh.doc_id, sh.pos
  FROM sh JOIN bench USING (s)
  WHERE sh.source <> '{BENCHMARK_SOURCE}'
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
