"""Round-4 extension queries, wave 3: streaming sketch maintenance,
incremental (CDC-style) dedup, tokenizer-training analytics, and
declarative data-quality checking.

- ``streaming_cms_token_topk`` — the Count-Min sketch maintained as a
  STREAMING aggregation (the build aggregate is mergeable, so the
  micro-batch groupBy IS the merge), drained and decoded by the shared
  batch read-back. Shares the batch CMS oracle: stream-built cells must
  equal batch-built cells exactly.
- ``incremental_dedup_new_docs`` — dedup a new ingest batch against the
  already-ingested corpus: the continuous-crawl posture (dedup against
  history without rescanning it into the batch) every training-data
  pipeline runs on each snapshot.
- ``bpe_merge_candidates`` — the first step of byte-pair-encoding
  tokenizer training (Sennrich et al. 2016, public): corpus-weighted
  adjacent-character pair counts over the word vocabulary, top-20 merge
  candidates.
- ``data_quality_report`` — Deequ-style declarative constraint metrics
  (completeness, uniqueness, range, referential integrity) computed in
  one pass per table + one anti-join, emitted as a tidy (metric, value)
  report.

Oracle convention identical to workload.py.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table


def _documents_file_stream(s: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of read_table(..., "documents"): schema-pinned file
    stream over the documents parquet — the shared setup for every
    streaming sketch query (one tokenization path, one schema probe).
    Layout-agnostic via ingest.table_file_stream (fault_sweep r8)."""
    from nbi_oedi_etl_spark.streaming import ingest

    return ingest.table_file_stream(s, sf_dir, "documents")


# ------------------------------------------ streaming CMS maintenance

def streaming_cms_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch maintained by Structured Streaming: file source →
    token explode → the (seed, bucket) cell aggregate as STREAMING state →
    availableNow drain → shared batch decode (operators/sketches.py
    cms_decode_topk) over the drained cells.

    Because the CMS build aggregate is distributive (cell = count), the
    streaming groupBy merges micro-batches into exactly the cells the
    batch build produces — so this query shares ``cms_token_topk``'s
    DuckDB oracle verbatim: the STREAM-built sketch content is
    value-hash-checked, not just its contract. At scale this is the
    continuous-ingest frequency monitor: state is bounded at depth×width
    cells regardless of corpus size.

    Reference parity: the reference's monitor keeps running counters over
    the ingest stream (etl/oedi_etl/monitor.py:87-136); this is the
    sketch-accurate generalization."""
    from nbi_oedi_etl_spark.operators import sketches
    from nbi_oedi_etl_spark.streaming import ingest

    s = ingest.scoped_streaming_session(spark)
    toks_stream = sketches.tokens_of(_documents_file_stream(s, sf_dir))
    cells = sketches.cms_cells(toks_stream, depth=4, width=256)
    q = ingest.run_available_now(cells, tempfile.mkdtemp(), queue_name="stream_cms")
    q.awaitTermination()
    sketch = s.table("stream_cms")
    toks_batch = sketches.tokens_of(read_table(s, sf_dir, "documents"))
    return sketches.cms_decode_topk(toks_batch, sketch, depth=4, width=256, k=20)


# ------------------------------------------ streaming HLL maintenance

def streaming_hll_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog registers maintained by Structured Streaming: token
    stream → per-register max(rho) as streaming state → availableNow
    drain → shared decode (operators/sketches.py hll_decode). max() is
    distributive, so the streaming groupBy merges micro-batches into
    exactly the registers the batch build produces — shares
    ``hll_distinct_tokens``'s oracle verbatim. State is m=64 rows
    regardless of stream volume: the continuous-ingest cardinality
    monitor."""
    from nbi_oedi_etl_spark.operators import sketches
    from nbi_oedi_etl_spark.streaming import ingest

    s = ingest.scoped_streaming_session(spark)
    toks_stream = sketches.tokens_of(_documents_file_stream(s, sf_dir))
    regs = sketches.hll_registers(toks_stream, m=64)
    q = ingest.run_available_now(regs, tempfile.mkdtemp(), queue_name="stream_hll")
    q.awaitTermination()
    drained = s.table("stream_hll")
    toks_batch = sketches.tokens_of(read_table(s, sf_dir, "documents"))
    return sketches.hll_decode(toks_batch, drained, m=64)


# ---------------------------------------- grouped HLL (per-source)

def hll_tokens_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP HyperLogLog: distinct-token estimate for every document
    source — the "approx distinct per group" shape that replaces
    COUNT(DISTINCT) when group × key cardinality makes the exact dedup
    shuffle prohibitive. State is |groups| × m register rows regardless
    of token volume; the same grouped max() aggregate is the merge, so
    shards/streams combine for free.

    Exactness: same m=64 md5 register family as the global
    `hll_distinct_tokens`; the 2^-reg harmonic sum runs as a SORTED
    ARRAY FOLD per group (registers packed j-ascending) because the
    registers are powers of two spanning 2^0..2^-55 — an unordered
    double SUM loses low bits once the partial exceeds 2^53·2^-55 and
    is not cross-engine stable.

    Plan: one exploded-token shuffle into (source, j) register maxima
    (map-side partials collapse to |groups|·m rows per task); the
    grid-fill join and the fold run on the |groups|·m aggregate.
    Implementation: the SAME hll_registers/hll_decode as the global and
    streaming variants, parameterized by group column — one sketch
    implementation, three deployment shapes."""
    from nbi_oedi_etl_spark.operators import sketches

    docs = read_table(spark, sf_dir, "documents")
    toks = sketches.tokens_of(docs, keep_cols=("source",))
    regs = sketches.hll_registers(toks, m=64, group_cols=("source",))
    return sketches.hll_decode(toks, regs, m=64, group_cols=("source",)).select(
        "source", "true_distinct", "hll_estimate"
    )


HLL_BY_SOURCE_ORACLE = """
WITH toks AS (
  SELECT source, unnest(string_split(lower(trim(text)), ' ')) AS tok
  FROM documents
), t AS (
  SELECT source, tok FROM toks WHERE tok <> ''
), h AS (
  SELECT source, tok, ('0x' || substring(md5(tok), 1, 15))::BIGINT AS hv FROM t
), r AS (
  SELECT source, hv % 64 AS j,
         CASE WHEN hv // 64 = 0 THEN 55
              ELSE 55 - length(bin(hv // 64)) END AS rho
  FROM h
), regs AS (
  SELECT source, j, max(rho) AS reg FROM r GROUP BY source, j
), grid AS (
  SELECT s.source, g.j, coalesce(regs.reg, 0) AS reg
  FROM (SELECT DISTINCT source FROM documents) s
  CROSS JOIN range(64) g(j)
  LEFT JOIN regs ON regs.source = s.source AND regs.j = g.j
), packed AS (
  SELECT source, list(reg ORDER BY j) AS rs FROM grid GROUP BY source
), est AS (
  SELECT source,
         0.709 * 64 * 64 / list_sum(list_transform(rs, x -> pow(2.0, -x))) AS raw,
         len(list_filter(rs, x -> x = 0)) AS v_empty
  FROM packed
), truth AS (
  SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS true_distinct
  FROM t GROUP BY source
)
SELECT truth.source, truth.true_distinct,
       CAST(round(CASE WHEN raw <= 160 AND v_empty > 0
                       THEN 64 * ln(64.0 / v_empty) ELSE raw END)
            AS BIGINT) AS hll_estimate
FROM truth JOIN est ON truth.source = est.source
"""


# ------------------------------------- built-in session windows

def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via Spark's BUILT-IN session_window
    (30-minute gap), per user: session start, exclusive end (last event
    + gap), event count, decimal-exact value sum. The declarative twin of
    the lag+cumsum `user_sessions` formulation — same semantics, but the
    merging-window operator is what Structured Streaming uses for
    streaming sessionization, so this proves the batch surface of that
    operator against a first-principles SQL oracle (new session when
    ts >= previous ts + gap, i.e. the window end is exclusive).

    Plan: one shuffle on user_id; session merge happens inside the
    aggregate (UpdatingSessionsIterator), no self-join."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").cast("decimal(18,6)").alias("value"),
    )
    g = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("value_sum_dec"),
    )
    return g.select(
        "user_id",
        F.col("w.start").cast("timestamp_ntz").alias("session_start"),
        F.col("w.end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
        F.col("value_sum_dec").cast("double").alias("value_sum"),
    )


SESSION_WINDOW_ORACLE = """
WITH e AS (
  SELECT user_id, ts, value FROM events
), marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM e
), sess AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
FROM sess
GROUP BY user_id, sid
"""


# --------------------------------- bottom-k quantile sketch (deciles)

_QSKETCH_K = 500


def quantile_sketch_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate deciles of o_totalprice from a DETERMINISTIC bottom-k
    sketch: the k=500 orders with the smallest md5(o_orderkey) are a
    uniform random sample (the hash is a fixed random permutation), so
    sample order statistics estimate population quantiles with standard
    √k error — and because the sample is hash-deterministic, the WHOLE
    approximate operator is value-hash-checked by the DuckDB twin (the
    same trick that made CMS/HLL exactly verifiable). Bottom-k is
    mergeable: union shards, re-take the k smallest.

    Accuracy vs the exact deciles is pinned in
    tests/test_quantile_sketch.py; the exact computation needs a total
    order (global sort) and is deliberately NOT part of this query — at
    100 TB you run the sketch, not the sort.

    Plan: the bottom-k cut is TakeOrderedAndProject (per-partition
    top-k before a single ordered gather of k rows); the rank window
    runs on the k-row sample (bounded single partition, k fixed);
    decile read-off is a broadcast-size join."""
    orders = read_table(spark, sf_dir, "orders")
    sample = (
        orders.select(
            "o_orderkey",
            "o_totalprice",
            F.md5(F.col("o_orderkey").cast("string")).alias("h"),
        )
        .orderBy("h", "o_orderkey")
        .limit(_QSKETCH_K)
    )
    n = sample.agg(F.count(F.lit(1)).alias("n_sample"))
    w = Window.orderBy("o_totalprice", "o_orderkey")
    ranked = sample.select(
        "o_totalprice", F.row_number().over(w).alias("rk")
    ).crossJoin(F.broadcast(n))
    qs = spark.range(1, 10).select(F.col("id").cast("int").alias("q"))
    picked = ranked.join(
        F.broadcast(qs),
        F.col("rk")
        == F.floor((F.col("q") * F.col("n_sample") + 9) / F.lit(10.0)).cast("int"),
    )
    return picked.select(
        "q",
        F.col("o_totalprice").alias("decile_value"),
        "n_sample",
    )


QUANTILE_SKETCH_ORACLE = r"""
WITH sample AS (
  SELECT o_orderkey, o_totalprice
  FROM orders
  ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
  LIMIT 500
), n AS (
  SELECT count(*) AS n_sample FROM sample
), ranked AS (
  SELECT o_totalprice,
         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rk
  FROM sample
)
SELECT q, o_totalprice AS decile_value, n.n_sample
FROM ranked, n, (SELECT unnest(range(1, 10)) AS q) qs
WHERE rk = CAST(floor((q * n.n_sample + 9) / 10.0) AS INTEGER)
"""


# ------------------------------------------- incremental (CDC) dedup

def incremental_dedup_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup: classify each document of a NEW ingest
    batch (doc_id % 3 == 0) against the already-ingested history
    (doc_id % 3 != 0) — ``dup_of_history`` if its content hash exists in
    history, ``dup_in_batch`` if an earlier new doc has the same hash,
    ``new`` otherwise. The per-snapshot posture of a continuous crawl:
    history contributes only its distinct hash set, never a rescan of its
    text.

    Plan: one shuffle on content hash serves both the within-batch
    min-id window and the history join (same key → exchange reuse); the
    history side is a distinct hash projection. No broadcast hint — the
    history hash set is O(corpus) and must sort-merge."""
    docs = read_table(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 3 == 0).select(
        "doc_id", F.md5("text").alias("content_hash")
    )
    hist = (
        docs.where(F.col("doc_id") % 3 != 0)
        .select(F.md5("text").alias("content_hash"))
        .distinct()
        .withColumn("_in_hist", F.lit(1))
    )
    w = Window.partitionBy("content_hash")
    flagged = (
        new.join(hist, "content_hash", "left")
        .withColumn("_min_id", F.min("doc_id").over(w))
    )
    return flagged.select(
        "doc_id",
        "content_hash",
        F.when(F.col("_in_hist").isNotNull(), F.lit("dup_of_history"))
        .when(F.col("doc_id") > F.col("_min_id"), F.lit("dup_in_batch"))
        .otherwise(F.lit("new"))
        .alias("status"),
    )


INCREMENTAL_DEDUP_ORACLE = r"""
WITH new_docs AS (
  SELECT doc_id, md5(text) AS content_hash FROM documents WHERE doc_id % 3 = 0
), hist AS (
  SELECT DISTINCT md5(text) AS content_hash FROM documents WHERE doc_id % 3 <> 0
), flagged AS (
  SELECT n.doc_id, n.content_hash,
         h.content_hash IS NOT NULL AS in_hist,
         min(n.doc_id) OVER (PARTITION BY n.content_hash) AS min_id
  FROM new_docs n LEFT JOIN hist h ON n.content_hash = h.content_hash
)
SELECT doc_id, content_hash,
       CASE WHEN in_hist THEN 'dup_of_history'
            WHEN doc_id > min_id THEN 'dup_in_batch'
            ELSE 'new' END AS status
FROM flagged
"""


# --------------------------------------- BPE merge-candidate mining

_BPE_TOPK = 20


def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First iteration of BPE tokenizer training (Sennrich et al. 2016):
    corpus-frequency-weighted counts of adjacent character pairs inside
    words, top-20 merge candidates. The standard trick: aggregate the
    corpus to its word VOCABULARY first (one token shuffle), then explode
    characters only over distinct words and weight pair counts by word
    frequency — character work scales with |vocab|, not corpus size.

    Plan: token count shuffle → per-word char explode (narrow) → one
    pair-keyed aggregate (exact BIGINT sums) → global top-k
    (TakeOrderedAndProject, never an unbounded sort)."""
    docs = read_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = (
        words.where(F.length("word") >= 2)
        .select(
            "word",
            "freq",
            F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i"),
        )
        .select(F.col("word").substr(F.col("i"), F.lit(2)).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
    )
    w = Window.orderBy(F.desc("pair_count"), F.asc("pair"))
    return (
        pairs.select("pair", "pair_count", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= _BPE_TOPK)
    )


BPE_ORACLE = r"""
WITH t AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
  FROM documents
), words AS (
  SELECT word, count(*) AS freq FROM t WHERE word <> '' GROUP BY word
), pairs AS (
  SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, freq
  FROM (SELECT word, freq, unnest(range(1, length(word))) AS i
        FROM words WHERE length(word) >= 2)
), counts AS (
  SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count FROM pairs GROUP BY pair
)
SELECT pair, pair_count, rank FROM (
  SELECT pair, pair_count,
         row_number() OVER (ORDER BY pair_count DESC, pair) AS rank
  FROM counts
) WHERE rank <= 20
"""


# ------------------------------------------- data-quality report

_DQ_DATE_CUTOFF = "1998-08-03"


def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative data-quality metrics over the orders table
    (completeness, uniqueness, value range, recency, referential
    integrity vs customer), emitted as a tidy (metric, value) report —
    the validation pass a pipeline runs before promoting a snapshot; the
    reference's reconciliation check (etl/oedi_etl/monitor.py) is the
    RI row here, generalized.

    Plan: ALL single-table metrics come from ONE scan/aggregate (count,
    conditional sums, count-distinct); the RI metric is one left-anti
    join; the report assembly is a constant-width stack over two 1-row
    tables. No per-constraint rescans."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    one_pass = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("bigint")).alias("n_null_custkey"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n_dup_orderkey"),
        F.sum((F.col("o_totalprice") <= 0).cast("bigint")).alias("n_nonpos_price"),
        F.sum(
            (F.col("o_orderdate") > F.lit(_DQ_DATE_CUTOFF).cast("timestamp")).cast(
                "bigint"
            )
        ).alias("n_future_dated"),
    )
    orphans = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphan_orders"))
    )
    rep = one_pass.crossJoin(orphans)
    return rep.select(
        F.expr(
            "stack(6,"
            " 'n_rows', n_rows,"
            " 'n_null_custkey', n_null_custkey,"
            " 'n_dup_orderkey', n_dup_orderkey,"
            " 'n_nonpos_price', n_nonpos_price,"
            " 'n_future_dated', n_future_dated,"
            " 'n_orphan_orders', n_orphan_orders) AS (metric, value)"
        )
    )


# ------------------------------------- portable sign-LSH ANN (oracle)

_ANN_PLANES = 8


def embedding_ann_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN with a CROSS-ENGINE-REPRODUCIBLE hyperplane family:
    plane p's d-th component is ±1 by the parity of md5(f"{p}|{d}")'s
    first hex digit, so the DuckDB twin rebuilds the SAME planes and the
    whole ANN pipeline — projection, bucketing, candidate join, exact
    cosine verification — is value-hash-checked end-to-end. This is the
    oracle twin of the production numpy-matmul sign-LSH
    (operators/similarity.py lsh_topk, rows-only); same bucketed-join
    shape, never all-pairs.

    Exactness: the dot product is a sequential left fold
    (F.aggregate(zip_with(...)) here, list_reduce(list_transform(...))
    in DuckDB — both evaluate ((0+x₁)+x₂)+… in index order, and
    0.0+x₁ ≡ x₁ in IEEE), so the sign bits and buckets agree bit-exactly;
    the verification cosine reuses the fold order proven bit-equal to
    DuckDB's list_cosine_similarity by embedding_topk_cosine.

    Plan: bucket assignment is map-only (8 folds per row, JVM codegen-
    adjacent HOFs — the ±1 planes are plan literals, not a join); the
    candidate join shuffles on bucket only."""
    import hashlib

    from nbi_oedi_etl_spark.operators import similarity

    emb = read_table(spark, sf_dir, "embeddings")
    first = emb.select("embedding").first()
    # empty corpus → any plane width works; the pipeline yields no pairs
    dim = len(first[0]) if first is not None and first[0] is not None else 1

    def _sign(p: int, d: int) -> float:
        h = hashlib.md5(f"{p}|{d}".encode()).hexdigest()
        return 1.0 if int(h[0], 16) % 2 == 0 else -1.0

    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    bits = []
    from nbi_oedi_etl_spark.operators._util import fast_lit

    for p in range(_ANN_PLANES):
        # one driver call per plane instead of one per component
        plane = fast_lit([_sign(p, d) for d in range(dim)])
        dot = F.aggregate(
            F.zip_with(F.col("emb"), plane, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    # r14 (guide §2.3): norms materialized once per SIDE row before the
    # bucket join — the verification cosine divides the same dot by the
    # same `_norm` doubles (bit-identical; the _cosine_prenormed rule),
    # instead of re-folding both norms per CANDIDATE PAIR.
    buckets = e.select(
        "vec_id", "emb", bucket.cast("bigint").alias("bucket")
    ).withColumn("_n", similarity._norm(F.col("emb")))
    a = buckets.select(
        F.col("vec_id").alias("vec_id_a"), F.col("emb").alias("ea"),
        F.col("_n").alias("_na"), "bucket"
    )
    b2 = buckets.select(
        F.col("vec_id").alias("vec_id_b"), F.col("emb").alias("eb"),
        F.col("_n").alias("_nb"), "bucket"
    )
    cand = a.join(b2, "bucket").where(F.col("vec_id_a") < F.col("vec_id_b"))
    sim = F.round(
        similarity._cosine_prenormed(
            F.col("ea"), F.col("eb"), F.col("_na"), F.col("_nb")
        ),
        6,
    )
    return (
        cand.select("bucket", "vec_id_a", "vec_id_b", sim.alias("cos_sim"))
        .where(F.col("cos_sim") >= 0.2)
    )


ANN_PORTABLE_ORACLE = r"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), dim AS (
  SELECT len(emb) AS n FROM e LIMIT 1
), signs AS (
  SELECT p,
         list(CASE WHEN ('0x' || substring(md5(p::VARCHAR || '|' || d::VARCHAR), 1, 1))::BIGINT % 2 = 0
                   THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END
              ORDER BY d) AS s
  FROM range(8) t(p), (SELECT unnest(range((SELECT n FROM dim))) AS d)
  GROUP BY p
), dots AS (
  SELECT e.vec_id, s.p,
         list_reduce(list_transform(e.emb, (x, i) -> x * s.s[i]), (a, b) -> a + b) AS dot
  FROM e, signs s
), buckets AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id
), cand AS (
  SELECT a.bucket, a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         round(list_cosine_similarity(ea.emb, eb.emb), 6) AS cos_sim
  FROM buckets a
  JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
)
SELECT bucket, vec_id_a, vec_id_b, cos_sim FROM cand WHERE cos_sim >= 0.2
"""


DQ_REPORT_ORACLE = r"""
WITH one_pass AS (
  SELECT count(*) AS n_rows,
         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null_custkey,
         count(*) - count(DISTINCT o_orderkey) AS n_dup_orderkey,
         CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_nonpos_price,
         CAST(sum(CASE WHEN o_orderdate > TIMESTAMP '1998-08-03' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_future_dated
  FROM orders
), orph AS (
  SELECT count(*) AS n_orphan_orders
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey IS NULL
)
SELECT 'n_rows' AS metric, n_rows AS value FROM one_pass
UNION ALL SELECT 'n_null_custkey', n_null_custkey FROM one_pass
UNION ALL SELECT 'n_dup_orderkey', n_dup_orderkey FROM one_pass
UNION ALL SELECT 'n_nonpos_price', n_nonpos_price FROM one_pass
UNION ALL SELECT 'n_future_dated', n_future_dated FROM one_pass
UNION ALL SELECT 'n_orphan_orders', n_orphan_orders FROM orph
"""
