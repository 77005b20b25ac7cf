"""Round-3 extension queries: training-data curation operators that close
the remaining pipeline gaps — benchmark decontamination, training-example
sequence assembly, deterministic mixture sampling, and embedding label
audit. Oracle convention identical to workload.py: every query has a
DuckDB twin with column names aliased identically on both sides.

Scale posture (SCALE.md): all four are single-wide-shuffle or map-only
shapes; the one join (contamination) broadcasts the benchmark side, which
is the realistic asymmetry — eval benchmarks are MBs, the corpus is TBs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.operators.similarity import _cosine_prenormed, _norm
from nbi_oedi_etl_spark.sources.parquet import read_table

# The held-out "benchmark" slice of the documents table: contamination is
# always measured against a designated eval set; src0 stands in for it.
_BENCHMARK_SOURCE = "src0"


# ------------------------------------------ benchmark decontamination

def cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination signal: for every document OUTSIDE the
    benchmark source, the fraction of its distinct word 3-grams that also
    occur in ANY benchmark document. Training pipelines drop or flag docs
    above a contamination threshold before training so eval numbers stay
    honest (the cross-dataset counterpart of shingle_novelty's intra-corpus
    overlap).

    Plan: codegen shingling (posexplode + lead — same shape as
    workload_ext3.shingle_novelty), one distinct, then a LEFT join whose
    build side is the distinct benchmark shingle set — broadcast, because
    the benchmark is small by construction (an eval suite is MBs even when
    the corpus is 100 TB), so the corpus side never reshuffles on the
    string key. Aggregation is a single hash agg on doc_id.
    """
    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("doc_id").orderBy("pos")
    words = docs.select(
        "doc_id", "source", F.posexplode(F.split("text", " ")).alias("pos", "w0")
    )
    sh = (
        words.select(
            "doc_id",
            "source",
            F.concat_ws(
                " ", "w0", F.lead("w0", 1).over(w), F.lead("w0", 2).over(w)
            ).alias("shingle"),
            F.lead("w0", 2).over(w).isNotNull().alias("full"),
        )
        .where("full")
        .select("doc_id", "source", "shingle")
        .distinct()
    )
    bench = (
        sh.where(F.col("source") == _BENCHMARK_SOURCE)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    rest = sh.where(F.col("source") != _BENCHMARK_SOURCE)
    return (
        rest.join(F.broadcast(bench), "shingle", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("hit").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "source",
            "n_shingles",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6).alias(
                "contamination_frac"
            ),
        )
    )


CONTAMINATION_ORACLE = r"""
WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
), sh AS (
  SELECT DISTINCT doc_id, source,
         unnest(list_transform(range(len(toks) - 2),
             i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingle
  FROM d
), bench AS (
  SELECT DISTINCT shingle FROM sh WHERE source = 'src0'
), rest AS (
  SELECT * FROM sh WHERE source <> 'src0'
)
SELECT r.doc_id, r.source,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       round(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
             / count(*), 6) AS contamination_frac
FROM rest r LEFT JOIN bench b USING (shingle)
GROUP BY r.doc_id, r.source
"""


# ------------------------------------------ training-example assembly

def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-example assembly from an event stream: one row per user
    with the time-ordered sequence of their event types plus span/volume
    stats — the sequence-modeling shape (next-event prediction, session
    LMs) built from raw logs.

    Plan: ONE shuffle (groupBy user_id); the ordered sequence comes from
    array_sort over collected (ts, event_id, type) structs — struct
    comparison is field-order lexicographic, so ties on ts break on the
    unique event_id and the result is deterministic without a window sort.
    All JVM built-ins; at 100 TB the only concern is a degenerate user
    (bot) whose collect_list exceeds memory — production would cap with a
    slice() after sort or pre-filter on a per-user count.
    """
    ev = read_table(spark, sf_dir, "events")
    seq = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda x: x["event_type"],
        ),
        ">",
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        seq.alias("event_seq"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


EVENT_SEQUENCES_ORACLE = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS first_ts,
       max(ts) AS last_ts,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS event_seq,
       round(sum(value), 6) AS total_value
FROM events
GROUP BY user_id
"""


# ------------------------------------------ deterministic mixture sampling

def weighted_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum / mixture sampling: keep each document with a per-source
    probability (the data-mixture knob of a pretraining run — upsample
    curated sources, downsample crawl), decided by a DETERMINISTIC uniform
    draw u = md5(doc_id)/2^32 so the sample is reproducible across runs
    and engines — no rand(), no seed plumbing, and re-runs touch identical
    rows (resumable at 100 TB).

    Weights here derive from the source index (src<i> → ((i % 4)+1)/5,
    i.e. 0.2/0.4/0.6/0.8); production would broadcast-join a weights dim
    table. Map-only: no shuffle, fully pushed-down scan, embarrassingly
    parallel at any scale. The integer-hex → /2^32 draw is exact in double
    on both engines, so the Spark/DuckDB comparison is bit-identical.
    """
    docs = read_table(spark, sf_dir, "documents")
    weight = ((F.substring("source", 4, 10).cast("int") % 4 + 1) / F.lit(5.0))
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    return (
        docs.select(
            "doc_id",
            "source",
            weight.alias("w"),
            u.alias("u"),
        )
        .where(F.col("u") < F.col("w"))
        .select(
            "doc_id",
            "source",
            F.round("w", 1).alias("sample_weight"),
            F.round("u", 6).alias("sample_u"),
        )
    )


MIXTURE_SAMPLE_ORACLE = """
WITH s AS (
  SELECT doc_id, source,
         ((CAST(substr(source, 4) AS INT) % 4) + 1) / 5.0 AS w,
         ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents
)
SELECT doc_id, source, round(w, 1) AS sample_weight, round(u, 6) AS sample_u
FROM s WHERE u < w
"""


# ------------------------------------------ embedding label audit

def label_centroid_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space label audit: per label, the member count, the
    centroid's norm, and the mean cosine of members to their own label
    centroid — the cohesion check run over classifier training data to
    catch mislabeled or collapsed classes before training.

    Plan: centroids via posexplode → (label, pos) avg → re-assembled with
    array_sort(collect_list(struct)) — two narrow-keyed hash aggs whose
    output is O(labels × dim), then BROADCAST back onto the corpus (the
    centroid table is tiny at any corpus scale) for a shuffle-free cosine
    pass; final per-label agg is the only corpus-wide shuffle, on a
    low-cardinality key with map-side partial aggregation.
    """
    emb = read_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    pos = emb.select("label", F.posexplode("emb").alias("pos", "v"))
    cent = (
        pos.groupBy("label", "pos")
        .agg(F.avg("v").alias("cv"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda x: x["cv"]
            ).alias("centroid")
        )
        .select(
            "label",
            "centroid",
            # r14 (guide §2.3): the centroid's UNROUNDED norm rides the
            # broadcast so the per-member cosine folds dot + member norm
            # only, instead of re-folding the label centroid's norm for
            # every member row; `_norm` is the exact fold `centroid_norm`
            # rounds, so the cosine doubles are bit-identical.
            _norm(F.col("centroid")).alias("_cn"),
            F.round(
                F.sqrt(
                    F.aggregate(
                        F.col("centroid"), F.lit(0.0), lambda acc, x: acc + x * x
                    )
                ),
                6,
            ).alias("centroid_norm"),
        )
    )
    per = emb.join(F.broadcast(cent), "label").select(
        "label",
        "centroid_norm",
        _cosine_prenormed(
            F.col("emb"), F.col("centroid"), _norm(F.col("emb")), F.col("_cn")
        ).alias("cos"),
    )
    return per.groupBy("label", "centroid_norm").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("cos"), 6).alias("mean_cos"),
    ).select("label", "n_vecs", "centroid_norm", "mean_cos")


LABEL_CENTROID_ORACLE = """
WITH e AS (
  SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), p AS (
  SELECT label, unnest(range(1, len(emb) + 1)) AS i, unnest(emb) AS v FROM e
), c AS (
  SELECT label, i, avg(v) AS cv FROM p GROUP BY label, i
), cent AS (
  SELECT label, list(cv ORDER BY i) AS centroid FROM c GROUP BY label
), m AS (
  SELECT e.label,
         round(sqrt(list_sum(list_transform(cent.centroid, x -> x * x))), 6)
           AS centroid_norm,
         list_cosine_similarity(e.emb, cent.centroid) AS cos
  FROM e JOIN cent USING (label)
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs, centroid_norm,
       round(avg(cos), 6) AS mean_cos
FROM m
GROUP BY label, centroid_norm
"""


# ------------------------------------------ portable sketches

def cms_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (operators/sketches.py) over document tokens, read
    back at the top-20 true-frequent tokens. The md5 hash family makes the
    sketch content — not just its contract — reproducible by the DuckDB
    twin, so this approximate operator is value-hash-checked exactly."""
    from nbi_oedi_etl_spark.operators import sketches

    return sketches.cms_topk_estimates(
        read_table(spark, sf_dir, "documents"), depth=4, width=256, k=20
    )


CMS_TOPK_ORACLE = """
WITH toks AS (
  SELECT unnest(string_split(lower(trim(text)), ' ')) AS tok FROM documents
), t AS (
  SELECT tok FROM toks WHERE tok <> ''
), cells AS (
  SELECT seed, ('0x' || substring(md5(seed::VARCHAR || '|' || tok), 1, 8))::BIGINT % 256 AS bucket,
         CAST(count(*) AS BIGINT) AS cell
  FROM t, range(4) s(seed)
  GROUP BY 1, 2
), true_counts AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS true_count FROM t GROUP BY tok
), topk AS (
  SELECT tok, true_count FROM true_counts
  ORDER BY true_count DESC, tok LIMIT 20
), probes AS (
  SELECT k.tok, k.true_count, s.seed,
         ('0x' || substring(md5(s.seed::VARCHAR || '|' || k.tok), 1, 8))::BIGINT % 256 AS bucket
  FROM topk k, range(4) s(seed)
)
SELECT p.tok AS token, p.true_count, min(c.cell) AS cms_estimate
FROM probes p JOIN cells c ON p.seed = c.seed AND p.bucket = c.bucket
GROUP BY p.tok, p.true_count
"""


def hll_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog (operators/sketches.py) distinct-token estimate beside
    the exact count — the md5-60-bit hash family and integer-rounded
    estimate make the whole sketch pipeline cross-engine exact."""
    from nbi_oedi_etl_spark.operators import sketches

    return sketches.hll_distinct_estimate(
        read_table(spark, sf_dir, "documents"), m=64
    )


HLL_DISTINCT_ORACLE = """
WITH toks AS (
  SELECT unnest(string_split(lower(trim(text)), ' ')) AS tok FROM documents
), t AS (
  SELECT tok FROM toks WHERE tok <> ''
), h AS (
  SELECT tok, ('0x' || substring(md5(tok), 1, 15))::BIGINT AS hv FROM t
), r AS (
  SELECT hv % 64 AS j,
         CASE WHEN hv // 64 = 0 THEN 55
              ELSE 55 - length(bin(hv // 64)) END AS rho
  FROM h
), regs AS (
  SELECT j, max(rho) AS reg FROM r GROUP BY j
), filled AS (
  SELECT g.j, coalesce(regs.reg, 0) AS reg
  FROM range(64) g(j) LEFT JOIN regs ON g.j = regs.j
), packed AS (
  SELECT list(reg ORDER BY j) AS rs FROM filled
), est AS (
  SELECT 0.709 * 64 * 64 / list_sum(list_transform(rs, x -> pow(2.0, -x))) AS raw,
         len(list_filter(rs, x -> x = 0)) AS v_empty
  FROM packed
)
SELECT (SELECT CAST(count(DISTINCT tok) AS BIGINT) FROM t) AS true_distinct,
       CAST(round(CASE WHEN raw <= 160 AND v_empty > 0
                       THEN 64 * ln(64.0 / v_empty) ELSE raw END)
            AS BIGINT) AS hll_estimate,
       CAST(64 AS INTEGER) AS n_registers,
       CAST(v_empty AS INTEGER) AS v_empty
FROM est
"""


# ------------------------------------------ Bloom-filter decontamination

def bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-scale variant of cross_source_contamination: instead of
    broadcasting the benchmark's raw shingle SET (O(benchmark bytes)), a
    Bloom filter caps the broadcast at m bits regardless of benchmark size
    (operators/sketches.py). Per doc: how many of its 3-gram shingles are
    MAYBE in the benchmark (upper bound — no false negatives; false
    positives at the (1-e^{-kn/m})^k paper rate, m=4096, k=2). The md5
    bit positions are engine-portable so even this approximate membership
    test is value-hash-checked exactly."""
    from nbi_oedi_etl_spark.operators import sketches

    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("doc_id").orderBy("pos")
    words = docs.select(
        "doc_id", "source", F.posexplode(F.split("text", " ")).alias("pos", "w0")
    )
    sh = (
        words.select(
            "doc_id",
            "source",
            F.concat_ws(
                " ", "w0", F.lead("w0", 1).over(w), F.lead("w0", 2).over(w)
            ).alias("shingle"),
            F.lead("w0", 2).over(w).isNotNull().alias("full"),
        )
        .where("full")
        .select("doc_id", "source", "shingle")
        .distinct()
    )
    bench = sh.where(F.col("source") == _BENCHMARK_SOURCE).select("shingle")
    bloom = sketches.bloom_bit_positions(bench, "shingle", m=4096, k=2)
    rest = sh.where(F.col("source") != _BENCHMARK_SOURCE)
    return sketches.bloom_probe_counts(
        rest, bloom, "shingle", ["doc_id", "source"], m=4096, k=2
    ).select(
        "doc_id",
        "source",
        F.col("n_items").alias("n_shingles"),
        F.col("n_maybe_member").alias("n_maybe_contaminated"),
    )


BLOOM_DECONTAMINATION_ORACLE = r"""
WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
), sh AS (
  SELECT DISTINCT doc_id, source,
         unnest(list_transform(range(len(toks) - 2),
             i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingle
  FROM d
), bench AS (
  SELECT DISTINCT shingle FROM sh WHERE source = 'src0'
), bloom AS (
  SELECT DISTINCT
         ('0x' || substring(md5('b' || i || '|' || shingle), 1, 8))::BIGINT % 4096
           AS bit_pos
  FROM bench, range(2) t(i)
), rest AS (
  SELECT doc_id, source, shingle FROM sh WHERE source <> 'src0'
), probe AS (
  SELECT doc_id, source, shingle, i,
         ('0x' || substring(md5('b' || i || '|' || shingle), 1, 8))::BIGINT % 4096
           AS bit_pos
  FROM rest, range(2) t(i)
), hit AS (
  SELECT doc_id, source, shingle,
         sum(CASE WHEN b.bit_pos IS NOT NULL THEN 1 ELSE 0 END) = 2 AS maybe
  FROM probe p LEFT JOIN bloom b USING (bit_pos)
  GROUP BY doc_id, source, shingle
)
SELECT doc_id, source,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT)
         AS n_maybe_contaminated
FROM hit
GROUP BY doc_id, source
"""


# ------------------------------------------ dedup representative selection

def near_dup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION table — the step between clustering and row
    dropping that every pipeline materializes: for each near-dup cluster
    (portable MinHash pairs → connected components), keep exactly one
    representative — the LONGEST member (ties to the lowest doc_id), the
    usual keep-the-most-complete-variant policy. Output one row per doc:
    (doc_id, cluster_id, cluster_size, kept) — downstream training reads
    WHERE kept.

    Plan: the pair-generation + closure stages come from the memoized
    ``portable_components`` (shared with the portable-cluster query — the
    closure is localCheckpoint-backed, so reuse is free). The join of the
    component table onto the full doc list carries NO strategy hint and no
    pre-join count: the node set is ≪ corpus on clean corpora but
    O(corpus) at high duplicate rates — exactly when dedup matters most —
    so the right strategy is runtime-dependent, and AQE already converts
    sort-merge → broadcast when the built side's ACTUAL size is under the
    threshold (comp is checkpoint-materialized, so its stats are real).
    cluster_size and the keep rank share ONE window shuffle on cluster_id.
    Value-hash-checked against DuckDB's recursive-CTE closure + window
    twin."""
    from nbi_oedi_etl_spark.workload_ext import portable_components

    docs = read_table(spark, sf_dir, "documents")
    comp = portable_components(spark, sf_dir)
    joined = docs.select("doc_id", "n_chars").join(
        comp, docs.doc_id == comp.node, "left"
    )
    labeled = joined.select(
        "doc_id",
        "n_chars",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
    )
    w = Window.partitionBy("cluster_id")
    wr = w.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return labeled.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.row_number().over(wr) == 1).alias("kept"),
    )


KEEP_BEST_ORACLE = r"""
WITH RECURSIVE d AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(len(toks) - 2),
             i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS s
  FROM d
), hs AS (
  SELECT doc_id, seed,
         min(('0x' || substring(md5(seed::VARCHAR || '|' || s), 1, 15))::BIGINT) AS m
  FROM sh, range(8) t(seed) GROUP BY doc_id, seed
), sig AS (
  SELECT doc_id, list(m ORDER BY seed) AS sig FROM hs GROUP BY doc_id
), bnd AS (
  SELECT doc_id, band, sig[2*band+1] AS v1, sig[2*band+2] AS v2
  FROM sig, range(4) t(band)
), pairs AS (
  SELECT DISTINCT a.doc_id AS u, b2.doc_id AS v
  FROM bnd a JOIN bnd b2 ON a.band = b2.band AND a.v1 = b2.v1 AND a.v2 = b2.v2
                         AND a.doc_id < b2.doc_id
), e AS (
  SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
), reach(u, v) AS (
  -- unbounded closure: UNION (not UNION ALL) dedups per level, so the
  -- recursion terminates when no new (u, v) reachability facts appear —
  -- exact on ANY component diameter, unlike a fixed hop bound
  SELECT u, v FROM e
  UNION
  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
), comp AS (
  SELECT u AS node, least(u, min(v)) AS component
  FROM reach
  GROUP BY u
), labeled AS (
  SELECT doc.doc_id, doc.n_chars,
         coalesce(c.component, doc.doc_id) AS cluster_id
  FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.node
)
SELECT doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
       (ROW_NUMBER() OVER (PARTITION BY cluster_id
            ORDER BY n_chars DESC, doc_id) = 1) AS kept
FROM labeled
"""


# ---------------------------------------- portable end-to-end near-dup

def near_dup_pipeline_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed near-dedup pipeline END-TO-END on the cross-engine-
    portable hash family: portable MinHash-LSH candidate generation
    (workload_ext._portable_minhash_pairs, the oracle-proven banding) →
    exact 3-gram Jaccard verification on candidates only → verified pairs
    with jaccard ≥ 0.5. This is the oracle-backed twin of the xxhash64
    ``near_dup_pipeline`` (rows-only, the fast production path): every
    stage — banding, candidate join, set intersection/union arithmetic —
    is value-hash-checked in one query instead of per-stage.

    Scale shape is identical to the production variant: the Jaccard join
    touches only the bounded candidate set, never all-pairs."""
    from nbi_oedi_etl_spark.operators import dedup
    from nbi_oedi_etl_spark.workload_ext import (
        _portable_minhash_pairs,
        portable_signatures_cached,
    )

    docs = read_table(spark, sf_dir, "documents")
    pairs = _portable_minhash_pairs(
        docs, sig=portable_signatures_cached(spark, sf_dir)
    )
    scored = dedup.ngram_jaccard(docs, pairs)
    return scored.where(F.col("jaccard") >= 0.5)


NEAR_DUP_PIPELINE_ORACLE = r"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(len(toks) - 2),
             i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS s
  FROM d
), hs AS (
  SELECT doc_id, seed,
         min(('0x' || substring(md5(seed::VARCHAR || '|' || s), 1, 15))::BIGINT) AS m
  FROM sh, range(8) t(seed) GROUP BY doc_id, seed
), sig AS (
  SELECT doc_id, list(m ORDER BY seed) AS sig FROM hs GROUP BY doc_id
), bnd AS (
  SELECT doc_id, band, sig[2*band+1] AS v1, sig[2*band+2] AS v2
  FROM sig, range(4) t(band)
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b2.doc_id AS doc_id_b
  FROM bnd a JOIN bnd b2 ON a.band = b2.band AND a.v1 = b2.v1 AND a.v2 = b2.v2
                         AND a.doc_id < b2.doc_id
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT p.doc_id_a, p.doc_id_b, count(*) AS n_inter
  FROM pairs p
  JOIN sh a ON a.doc_id = p.doc_id_a
  JOIN sh b ON b.doc_id = p.doc_id_b AND b.s = a.s
  GROUP BY p.doc_id_a, p.doc_id_b
), scored AS (
  SELECT i.doc_id_a, i.doc_id_b,
         round(i.n_inter / (na.n + nb.n - i.n_inter), 6) AS jaccard
  FROM inter i
  JOIN sizes na ON na.doc_id = i.doc_id_a
  JOIN sizes nb ON nb.doc_id = i.doc_id_b
)
SELECT doc_id_a, doc_id_b, jaccard FROM scored WHERE jaccard >= 0.5
"""
