"""Round-11 wave 2: product quantization, seeded epoch shuffle, and
CCNet-style perplexity bucketing (§2.12 extension).

- ``embedding_pq_codes`` — PRODUCT QUANTIZATION training + encoding
  (Jégou et al. 2011): split each vector into M subvectors, run Lloyd
  k-means independently per subspace (the ``kmeans_lloyd_3iter`` recipe
  with ``sub`` as an extra group key), and encode every vector as M
  small code ids. This is the memory layout that makes 100 TB ANN
  feasible: M bytes per vector instead of 4·dim — the corpus-resident
  complement of ``embedding_int8_quantization`` (which keeps dim values)
  and the IVF layout (which prunes the scan but stores full vectors).
- ``embedding_pq_adc_topk`` — ASYMMETRIC DISTANCE COMPUTATION top-k over
  the PQ codes: the query stays full-precision, corpus distances come
  entirely from the (sub, code) → centroid lookup table, so the scan
  never touches raw vectors. Production composes this with the IVF
  layout (probe cells, then ADC on the survivors — IVF-PQ); here the
  oracled spec runs the flat scan so every stage is value-checked.
- ``corpus_epoch_shuffle`` — deterministic SEEDED per-epoch training
  order: shuffle position = rank of md5(epoch, doc_id) within the
  epoch, so every epoch is a reproducible pseudo-random permutation and
  re-runs land byte-identical shards. The rank is a cumsum of 1s over a
  unique order, routed through ``skew.keyed_cumsum`` — ``epoch`` is the
  lowest-cardinality key imaginable, exactly the single-task window the
  two-pass spine exists for (bucketized by the hash's leading byte, the
  ``source_token_budget_cap`` pattern).
- ``ccnet_perplexity_buckets`` — the CCNet filtering decision (Wenzek
  et al. 2020): score each document with a corpus-trained word-bigram
  LM (add-one smoothing), then bucket per source into head / middle /
  tail terciles by perplexity rank. Scoring follows the
  ``char_bigram_lm_score`` exactness recipe (model log-probs rounded
  once to 9 places, DECIMAL(18,9) per-doc sums); the tercile is pure
  integer arithmetic on a ``skew.keyed_cumsum`` rank — no per-source
  single-task window, no float threshold comparisons.

Oracle convention identical to workload.py (DuckDB twins, shared
rounding expressions, aliased columns both sides).

Reference parity: no reference analogue (§2.12 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources import read_table

# ------------------------------------------------ product quantization

#: Number of PQ subspaces (the 64-dim test embeddings split 4 × 16).
PQ_M = 4

#: Dimensions per subspace.
PQ_DSUB = 16

#: Codes per subspace codebook (per-subspace k-means k). M=4 × k=4 means
#: every vector compresses to 4 code ids — at byte codes and k ≤ 256,
#: 64 float32 dims (256 B) become 4 B per vector.
PQ_K = 4


def _pq_subvectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, sub, semb): each embedding split into ``PQ_M`` contiguous
    ``PQ_DSUB``-dim subvectors — ``similarity.pq_subvectors`` over the
    testdata table (ONE subvector definition; the at-rest IVF-PQ layout
    shares it)."""
    from nbi_oedi_etl_spark.operators.similarity import pq_subvectors

    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    return pq_subvectors(e, PQ_M, PQ_DSUB)


def _pq_assign(subs: DataFrame, codebook: DataFrame) -> DataFrame:
    """Shared per-subspace argmin — ``similarity.pq_assign`` (broadcast
    codebook, ties to the lowest code id, JVM-side end to end)."""
    from nbi_oedi_etl_spark.operators.similarity import pq_assign

    return pq_assign(subs, codebook)


_PQ_FLAT_INDEX_CACHE: dict = {}


def _pq_train(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """One Lloyd update per subspace codebook (init = the first ``PQ_K``
    vectors' subvectors, exactly the ``kmeans_lloyd_3iter`` seeding —
    the oracle encodes ``vec_id < PQ_K``, so the init is pinned here
    rather than ``pq_train_codebook``'s generic k-smallest default), then
    the final assignment. Returns (subvectors, trained codebook).

    The loop itself is ``similarity.pq_train_codebook`` — the ONE Lloyd
    definition (DECIMAL(18,9)-mean update, bounded O(k·dim) driver
    state, lineage truncated; ``kmeans_lloyd_3iter`` proves the deeper
    iteration of the same pair) — called with the pinned
    ``init_predicate`` so the init matches the oracle expression
    exactly."""
    subs, cb1, _a1 = _pq_flat_index_cached(spark, sf_dir)
    return subs, cb1


def _pq_flat_index_cached(spark: SparkSession, sf_dir: str):
    """The flat-PQ index — subvectors, trained codebook, final encode
    (with per-sub residual distance) — shared by ``embedding_pq_codes``,
    ``embedding_pq_adc_topk``, and ``pq_recall_audit`` (which calls the
    ADC spec internally). Memoized per (applicationId, sf_dir) and
    localCheckpoint-materialized, the ``_ivfpq_index_cached``
    discipline: one bench session otherwise re-runs the identical Lloyd
    training up to TEN times (3 specs × median-of-3 + the audit's
    internal ADC call). Returns ``(subs, cb1, a1)`` where ``a1`` is the
    assignment WITH the ``dist`` column."""
    from nbi_oedi_etl_spark.operators.similarity import pq_train_codebook
    from nbi_oedi_etl_spark.workload_ext import _memo_get

    def build():
        subs = _pq_subvectors(spark, sf_dir).localCheckpoint(eager=True)
        cb1 = pq_train_codebook(
            subs, PQ_K, init_predicate=F.col("vec_id") < PQ_K
        ).localCheckpoint(eager=True)
        a1 = _pq_assign(subs, cb1).localCheckpoint(eager=True)
        return (subs, cb1, a1)

    return _memo_get(_PQ_FLAT_INDEX_CACHE, spark, sf_dir, build)


def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode the corpus: (vec_id, sub, code, sub_distance) — each
    vector's nearest trained code per subspace with the residual L2 to
    that code (the per-subspace quantization error), rounded to 6.

    Every stage is cross-engine exact: the init is deterministic (first
    k vectors), the Lloyd update is the DECIMAL-mean recipe, distances
    use the index-order fold proven bit-equal to DuckDB's
    ``list_distance``. Plan/scale: codebooks broadcast (M·k rows); both
    assignment passes are per-row reductions over the broadcast side —
    the corpus is scanned twice and never shuffled (the per-(vec_id,
    sub) argmin window partitions on the corpus's own unique key, so AQE
    sees a WindowGroupLimit over narrow rows, not a hot key).
    Index side via ``_pq_flat_index_cached`` (one training per session
    across the flat-PQ family)."""
    _subs, _cb1, a1 = _pq_flat_index_cached(spark, sf_dir)
    return a1.select(
        "vec_id",
        F.col("sub").cast("long").alias("sub"),
        F.col("code").cast("long").alias("code"),
        F.round("dist", 6).alias("sub_distance"),
    )


_PQ_ORACLE_PREFIX = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), subs AS (
  SELECT vec_id, s AS sub,
         list_slice(emb, s * {PQ_DSUB} + 1, s * {PQ_DSUB} + {PQ_DSUB}) AS semb
  FROM e, unnest(range({PQ_M})) t(s)
), cb0 AS (
  SELECT sub, vec_id AS code, semb AS c_emb FROM subs WHERE vec_id < {PQ_K}
), a0 AS (
  SELECT vec_id, sub, semb, code FROM (
    SELECT s.vec_id, s.sub, s.semb, c.code,
           row_number() OVER (PARTITION BY s.vec_id, s.sub
                              ORDER BY list_distance(s.semb, c.c_emb),
                                       c.code) AS rn
    FROM subs s JOIN cb0 c ON c.sub = s.sub
  ) WHERE rn = 1
), cb1 AS (
  SELECT sub, code, list(m ORDER BY d) AS c_emb FROM (
    SELECT sub, code, d,
           CAST(sum(CAST(semb[d] AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS m
    FROM (SELECT sub, code, semb,
                 unnest(range(1, len(semb) + 1)) AS d FROM a0)
    GROUP BY sub, code, d
  ) GROUP BY sub, code
), a1 AS (
  SELECT vec_id, sub, code, dist FROM (
    SELECT s.vec_id, s.sub, c.code,
           list_distance(s.semb, c.c_emb) AS dist,
           row_number() OVER (PARTITION BY s.vec_id, s.sub
                              ORDER BY list_distance(s.semb, c.c_emb),
                                       c.code) AS rn
    FROM subs s JOIN cb1 c ON c.sub = s.sub
  ) WHERE rn = 1
)"""

PQ_CODES_ORACLE = (
    _PQ_ORACLE_PREFIX
    + """
SELECT vec_id, CAST(sub AS BIGINT) AS sub, CAST(code AS BIGINT) AS code,
       round(dist, 6) AS sub_distance
FROM a1
"""
)


#: Query set for the ADC spec (vec_id < this) and neighbors returned.
PQ_N_QUERIES = 8
PQ_TOPK = 3


def embedding_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance top-k: for each query vector (full precision)
    rank the corpus by the PQ approximation sqrt(Σ_sub ‖q_sub −
    codebook[sub][code]‖²) — corpus distances computed ENTIRELY from the
    code table, never the raw vectors. Output (query_id, neighbor_id,
    rank, adc_distance), top ``PQ_TOPK`` per query, self excluded, ties
    to the lower neighbor id.

    Exactness: per-sub distances use the proven index-order fold; the
    4-term sum is written as an explicit d0+d1+d2+d3 chain (fixed IEEE
    evaluation order both engines — no aggregate whose addend order an
    engine could permute). Plan/scale: the query side (bounded —
    queries × M subvector rows) broadcasts into the code join, the
    per-(query, vec) reduce is a conditional-sum aggregate keyed by the
    corpus's own unique key, and the final top-k is a per-query
    WindowGroupLimit. At 100 TB this is the IVF-PQ residual scan: the
    code table is M bytes/vector, so the scan reads ~1% of the raw
    corpus bytes; composing with probe_ivf_layout prunes it further to
    the probed-cell union."""
    subs, cb1, a1 = _pq_flat_index_cached(spark, sf_dir)
    codes = a1.select("vec_id", "sub", "code")
    q = subs.where(F.col("vec_id") < PQ_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "sub", F.col("semb").alias("q_semb")
    )
    from nbi_oedi_etl_spark.operators.similarity import l2_distance

    d = (
        codes.join(F.broadcast(cb1), ["sub", "code"])
        .join(F.broadcast(q), "sub")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "sub",
            (
                l2_distance(F.col("q_semb"), F.col("c_emb"))
                * l2_distance(F.col("q_semb"), F.col("c_emb"))
            ).alias("d2"),
        )
    )
    return _adc_topk(d, PQ_TOPK, "neighbor_id")


def _adc_topk(d: DataFrame, topk: int, out_id_alias: str) -> DataFrame:
    """Shared ADC aggregation tail for the flat scan AND the IVF-PQ
    composition: per-(query, candidate) conditional per-sub sums, the
    explicit fixed-IEEE-order d2_0 + d2_1 + … chain (correctness-
    bearing — an aggregate whose addend order an engine could permute
    would break cross-engine exactness), sqrt, per-query rank window
    (WindowGroupLimit), rounded output."""
    sub_d2 = [
        F.sum(F.when(F.col("sub") == s, F.col("d2"))).alias(f"d2_{s}")
        for s in range(PQ_M)
    ]
    adc = d.groupBy("query_id", "vec_id").agg(*sub_d2)
    total = F.col("d2_0")
    for s in range(1, PQ_M):
        total = total + F.col(f"d2_{s}")
    adc = adc.select("query_id", "vec_id", F.sqrt(total).alias("adc"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select(
            "query_id",
            F.col("vec_id").alias(out_id_alias),
            F.col("rank").cast("long").alias("rank"),
            F.round("adc", 6).alias("adc_distance"),
        )
    )


PQ_ADC_ORACLE = (
    _PQ_ORACLE_PREFIX
    + f"""
, q AS (
  SELECT vec_id AS query_id, sub, semb AS q_semb
  FROM subs WHERE vec_id < {PQ_N_QUERIES}
), d AS (
  SELECT q.query_id, a.vec_id, a.sub,
         list_distance(q.q_semb, c.c_emb)
           * list_distance(q.q_semb, c.c_emb) AS d2
  FROM a1 a
  JOIN cb1 c ON c.sub = a.sub AND c.code = a.code
  JOIN q ON q.sub = a.sub
  WHERE a.vec_id <> q.query_id
), adc AS (
  SELECT query_id, vec_id,
         sqrt(sum(CASE WHEN sub = 0 THEN d2 END)
              + sum(CASE WHEN sub = 1 THEN d2 END)
              + sum(CASE WHEN sub = 2 THEN d2 END)
              + sum(CASE WHEN sub = 3 THEN d2 END)) AS adc
  FROM d GROUP BY query_id, vec_id
), ranked AS (
  SELECT query_id, vec_id, adc,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc, vec_id) AS rank
  FROM adc
)
SELECT query_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank,
       round(adc, 6) AS adc_distance
FROM ranked WHERE rank <= {PQ_TOPK}
"""
)


# ------------------------------------------------ seeded epoch shuffle

#: Training epochs materialized per run and shard fan-out per epoch.
SHUFFLE_EPOCHS = 3
SHUFFLE_SHARDS = 4


def corpus_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded training order: for each epoch, every doc's
    shuffle position is the rank of ``md5('ep<epoch>:<doc_id>')`` within
    that epoch — a reproducible pseudo-random permutation per epoch
    (re-running the pipeline lands byte-identical orders and shards; a
    different epoch re-keys the hash, so consecutive epochs see the
    corpus in independent orders — the data-ordering contract of a
    training run). Output: (epoch, doc_id, shuffle_pos, shard) with
    shard = (pos − 1) mod ``SHUFFLE_SHARDS``, the round-robin writer
    assignment that keeps shards position-balanced.

    Plan/scale: the rank is a cumsum of 1s over the unique (h, doc_id)
    order routed through ``skew.keyed_cumsum`` — ``epoch`` has
    ``SHUFFLE_EPOCHS`` values TOTAL, the most extreme low-cardinality
    key in the registry, so above the dispatch crossover the two-pass
    spine buckets by the hash's leading byte (256 balanced buckets by
    construction — md5 is uniform) instead of funnelling each epoch
    through one task. Below it (the test SF) the naive keyed window
    runs. Same contract as ``source_token_budget_cap``."""
    from nbi_oedi_etl_spark.operators.skew import keyed_cumsum

    d = read_table(spark, sf_dir, "documents").select("doc_id")
    ep = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(SHUFFLE_EPOCHS - 1))).alias("epoch"),
    ).withColumn(
        "h",
        F.md5(
            F.concat(
                F.lit("ep"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ),
    ).withColumn("one", F.lit(1))
    bucket = F.conv(F.substring("h", 1, 2), 16, 10).cast("bigint")
    ranked = keyed_cumsum(
        ep, "epoch", ["h", "doc_id"], bucket, "one", out_col="shuffle_pos"
    )
    return ranked.select(
        F.col("epoch").cast("long").alias("epoch"),
        "doc_id",
        F.col("shuffle_pos").cast("long").alias("shuffle_pos"),
        ((F.col("shuffle_pos") - 1) % SHUFFLE_SHARDS).cast("long").alias("shard"),
    )


EPOCH_SHUFFLE_ORACLE = f"""
WITH ep AS (
  SELECT doc_id, e AS epoch,
         md5('ep' || CAST(e AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents, unnest(range({SHUFFLE_EPOCHS})) t(e)
), ranked AS (
  SELECT doc_id, epoch,
         row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id) AS pos
  FROM ep
)
SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
       CAST(pos AS BIGINT) AS shuffle_pos,
       CAST((pos - 1) % {SHUFFLE_SHARDS} AS BIGINT) AS shard
FROM ranked
"""


# --------------------------------------- CCNet perplexity bucketing


def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet quality-filtering decision: score each document with a
    corpus-trained word-bigram LM — add-one smoothing, p(w2|w1) =
    (c(w1,w2)+1)/(c(w1,·)+V) — as mean negative log-probability per
    bigram, then bucket per source into head / middle / tail terciles by
    score rank (CCNet trains KenLM on held-out Wikipedia; the in-corpus
    order-1 model keeps every stage oracle-buildable, the
    ``char_bigram_lm_score`` adjudication). Output: (doc_id, source,
    n_bigrams, ppl_score, bucket) for every doc with ≥ 1 bigram; lower
    score = more predictable = 'head'.

    Exactness: model log-probs round once to 9 places, per-doc sums run
    in DECIMAL(18,9) (order-independent), the surfaced score divides
    once and rounds to 6; the tercile is pure integer arithmetic
    (3·(rank−1)) div n_source on exact ranks — no float threshold
    comparison anywhere, so ties can never straddle engines.

    Plan/scale: bigrams come straight off each doc's token array (no
    doc-keyed window sort — adjacency is an array property); the
    bigram-grain frame materializes ONCE (localCheckpoint) because the
    model aggregate and the score join need it under different
    partitionings. The word-bigram model is corpus-bounded but NOT
    broadcast-bounded (vocab² worst case) — the score join shuffles on
    (w1, w2), a plain keyed join; the per-source rank is a cumsum of 1s
    through ``skew.keyed_cumsum`` (source is low-cardinality — above
    the crossover the spine buckets by floor(score·8), below it the
    naive keyed window), and per-source doc counts are one tiny
    broadcast aggregate. At 100 TB CCNet proper swaps the in-corpus
    model for a held-out one (the scoring join disappears into a
    broadcast of the trained model's top tail + a bounded OOV default)
    — the bucketing machinery is unchanged."""
    from nbi_oedi_etl_spark.operators.skew import keyed_cumsum

    docs = (
        read_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
        .select(
            "doc_id",
            "source",
            F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks"),
        )
    )
    tk = docs.select(F.explode("toks").alias("w"))
    # bigrams come straight off the token ARRAY (the ext35 shingle
    # pattern) — zero doc-keyed window shuffle; adjacency is a property
    # of the array, not of a sort order the engine must re-establish
    # (the first draft's lead() window cost a corpus-wide doc-keyed
    # sort exchange; measured ~3× the whole query's wall at 10×)
    bgn = (
        docs.where(F.size("toks") >= 2)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "source", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("doc_id", "source", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # bgn feeds the model aggregate AND the score join under DIFFERENT
    # partitionings ((w1,w2) vs the doc-grain agg), so ReuseExchange
    # cannot share them and plain lineage re-runs the explode + lead
    # window once per consumer — measured ~3× wall at the 10× probe
    # scale. Materialize the bigram-grain frame once (executor-storage
    # bounded: one row per distinct (doc, bigram) — the "tokenize once"
    # posture of a real corpus pipeline).
    bgn = bgn.localCheckpoint()
    model = bgn.groupBy("w1", "w2").agg(F.sum("n").alias("cnt"))
    ctx = model.groupBy("w1").agg(F.sum("cnt").alias("ctx_n"))
    vocab = tk.agg(F.countDistinct("w").alias("vocab"))
    lnm = (
        model.join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("cnt") + F.lit(1.0))
                    / (F.col("ctx_n") + F.col("vocab"))
                ),
                9,
            ).alias("lnp"),
        )
    )
    scored = (
        bgn.join(lnm, ["w1", "w2"])
        .groupBy("doc_id", "source")
        .agg(
            F.sum("n").alias("n_bigrams"),
            # decimal(10,0) cast keeps the product at (29,9) — exact
            # (the char_bigram_lm_score precision note)
            F.sum(
                F.col("lnp").cast("decimal(18,9)") * F.col("n").cast("decimal(10,0)")
            ).alias("_s"),
        )
        .select(
            "doc_id",
            "source",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.round(
                -F.col("_s").cast("double") / F.col("n_bigrams"), 6
            ).alias("ppl_score"),
        )
        .withColumn("one", F.lit(1))
    )
    # The doc-grain score frame feeds THREE consumers (the dispatch
    # probe's count, the per-source totals, and the rank window); with
    # plain lineage each would re-run the whole LM-scoring pipeline —
    # measured 3× wall at the 10× probe scale. Checkpoint it so scoring
    # runs once (the kcore/bfs posture: one row per scored doc,
    # executor-storage-bounded, lineage truncated).
    scored = scored.localCheckpoint()
    ns = scored.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    bucket_col = F.floor(F.col("ppl_score") * 8).cast("bigint")
    ranked = keyed_cumsum(
        scored, "source", ["ppl_score", "doc_id"], bucket_col, "one", out_col="rk"
    ).join(F.broadcast(ns), "source")
    tercile = F.expr("(3 * (rk - 1)) div n_s")
    return ranked.select(
        "doc_id",
        "source",
        "n_bigrams",
        "ppl_score",
        F.when(tercile == 0, F.lit("head"))
        .when(tercile == 1, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


CCNET_PERPLEXITY_ORACLE = r"""
WITH d AS (
  SELECT doc_id, source, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
), tk AS (
  SELECT doc_id, source, i AS pos, toks[i + 1] AS w
  FROM d, unnest(range(len(toks))) t(i)
), bg AS (
  SELECT doc_id, source, w AS w1,
         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tk
), bgn AS (
  SELECT doc_id, source, w1, w2, count(*) AS n
  FROM bg WHERE w2 IS NOT NULL GROUP BY doc_id, source, w1, w2
), model AS (
  SELECT w1, w2, sum(n) AS cnt FROM bgn GROUP BY w1, w2
), ctx AS (
  SELECT w1, sum(cnt) AS ctx_n FROM model GROUP BY w1
), v AS (
  SELECT count(DISTINCT w) AS vocab FROM tk
), lnm AS (
  SELECT m.w1, m.w2,
         round(ln((m.cnt + 1.0) / (c.ctx_n + v.vocab)), 9) AS lnp
  FROM model m JOIN ctx c USING (w1), v
), scored AS (
  SELECT b.doc_id, b.source,
         CAST(sum(b.n) AS BIGINT) AS n_bigrams,
         round(-CAST(sum(CAST(l.lnp AS DECIMAL(18,9))
                          * CAST(b.n AS DECIMAL(10,0))) AS DOUBLE)
               / sum(b.n), 6) AS ppl_score
  FROM bgn b JOIN lnm l ON b.w1 = l.w1 AND b.w2 = l.w2
  GROUP BY b.doc_id, b.source
), ranked AS (
  SELECT doc_id, source, n_bigrams, ppl_score,
         row_number() OVER (PARTITION BY source
                            ORDER BY ppl_score, doc_id) AS rk,
         count(*) OVER (PARTITION BY source) AS n_s
  FROM scored
)
SELECT doc_id, source, n_bigrams, ppl_score,
       CASE (3 * (rk - 1)) // n_s
            WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
FROM ranked
"""


def pq_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@``PQ_TOPK`` of the PQ-ADC top-k against the exact
    brute-force L2 top-k, per query — the QUALITY measurement of the
    compressed-domain scan, itself oracle-checked (codebook training,
    encoding, ADC, and the exact ground truth are all deterministic, so
    the recall numbers value-hash-check cross-engine). The ANN-family
    evidence convention: every approximate tier ships with its recall
    audit (`ann_recall_portable` for IVF, this for PQ).

    Plan/scale: ground truth is the broadcast-queries brute-force shape
    (bounded query set against the corpus, per-query WindowGroupLimit);
    the PQ side reuses ``embedding_pq_adc_topk``'s plan; the overlap
    join is on the two tiny (queries × k) result tables."""
    from nbi_oedi_etl_spark.operators.similarity import l2_distance

    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    q = e.where(F.col("vec_id") < PQ_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.round(l2_distance(F.col("q_emb"), F.col("emb")), 6).alias("d"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("cand_id"))
    exact = scored.select(
        "query_id", "cand_id", F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= PQ_TOPK)
    approx = embedding_pq_adc_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("cand_id"), F.lit(1).alias("_hit")
    )
    joined = exact.join(approx, ["query_id", "cand_id"], "left")
    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.coalesce("_hit", F.lit(0))).alias("n_found"),
        F.round(
            F.sum(F.coalesce("_hit", F.lit(0))) * F.lit(1.0) / F.count(F.lit(1)), 6
        ).alias(f"recall_at_{PQ_TOPK}"),
    )


PQ_RECALL_ORACLE = (
    _PQ_ORACLE_PREFIX
    + f"""
, q AS (
  SELECT vec_id AS query_id, sub, semb AS q_semb
  FROM subs WHERE vec_id < {PQ_N_QUERIES}
), dd AS (
  SELECT q.query_id, a.vec_id, a.sub,
         list_distance(q.q_semb, c.c_emb)
           * list_distance(q.q_semb, c.c_emb) AS d2
  FROM a1 a
  JOIN cb1 c ON c.sub = a.sub AND c.code = a.code
  JOIN q ON q.sub = a.sub
  WHERE a.vec_id <> q.query_id
), adc AS (
  SELECT query_id, vec_id,
         sqrt(sum(CASE WHEN sub = 0 THEN d2 END)
              + sum(CASE WHEN sub = 1 THEN d2 END)
              + sum(CASE WHEN sub = 2 THEN d2 END)
              + sum(CASE WHEN sub = 3 THEN d2 END)) AS adc
  FROM dd GROUP BY query_id, vec_id
), approx AS (
  SELECT query_id, vec_id AS cand_id FROM (
    SELECT query_id, vec_id, adc,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc, vec_id) AS rank
    FROM adc
  ) WHERE rank <= {PQ_TOPK}
), qfull AS (
  SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < {PQ_N_QUERIES}
), bf AS (
  SELECT qf.query_id, e.vec_id AS cand_id,
         round(list_distance(qf.q_emb, e.emb), 6) AS d
  FROM e CROSS JOIN qfull qf WHERE e.vec_id <> qf.query_id
), exact AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
           row_number() OVER (PARTITION BY query_id ORDER BY d, cand_id) AS rank
    FROM bf
  ) WHERE rank <= {PQ_TOPK}
)
SELECT ex.query_id,
       count(*) AS k,
       CAST(sum(CASE WHEN ap.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_found,
       round(sum(CASE WHEN ap.cand_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS recall_at_{PQ_TOPK}
FROM exact ex
LEFT JOIN approx ap ON ex.query_id = ap.query_id AND ex.cand_id = ap.cand_id
GROUP BY ex.query_id
"""
)


# ------------------------------------------------ IVF-PQ composition

#: Coarse cells for the IVF-PQ composition (the embedding_ivf_portable
#: coarse quantizer) and its query set / result depth.
IVFPQ_COARSE_K = 8
IVFPQ_N_QUERIES = 20
IVFPQ_TOPK = 3


_IVFPQ_INDEX_CACHE: dict = {}


def _ivfpq_index_cached(spark: SparkSession, sf_dir: str):
    """The portable IVFADC INDEX side — coarse assignment, per-cell
    residual subvectors, the residual-PQ codebook, and the dense code
    table — shared verbatim by ``ivf_pq_portable`` (nprobe=1 probe) and
    ``ivf_pq_recall_curve`` (ranked multi-cell probe sweep). Memoized
    per (applicationId, sf_dir) and localCheckpoint-materialized, the
    ``portable_signatures_cached`` discipline: the index is a pure
    function of an immutable testdata directory, and one bench/driver
    session otherwise re-trains the same codebook 6× (2 specs ×
    median-of-3). Returns ``(assign, cent_arr, rsubs, cb1, codes)``."""
    from nbi_oedi_etl_spark.operators import similarity
    from nbi_oedi_etl_spark.operators.similarity import pq_train_codebook
    from nbi_oedi_etl_spark.workload_ext import _memo_get

    def build():
        emb = read_table(spark, sf_dir, "embeddings")
        cents = emb.where(F.col("vec_id") < IVFPQ_COARSE_K).withColumnRenamed(
            "vec_id", "centroid_id"
        )
        assign = similarity.kmeans_assignment_step(emb, cents).select(
            "vec_id", F.col("centroid_id").alias("cell")
        ).localCheckpoint(eager=True)
        cent_arr = cents.select(
            F.col("centroid_id").alias("cell"),
            F.col("embedding").cast("array<double>").alias("cent_emb"),
        )
        e = (
            emb.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("emb")
            )
            .join(assign, "vec_id")
            .join(F.broadcast(cent_arr), "cell")
            .select(
                "vec_id",
                "cell",
                F.zip_with("emb", "cent_emb", lambda x, y: x - y).alias("res"),
            )
        )
        rsubs = e.select(
            "vec_id",
            "cell",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {PQ_M - 1}),"
                    f" s -> slice(res, s * {PQ_DSUB} + 1, {PQ_DSUB}))"
                )
            ).alias("sub", "semb"),
        ).localCheckpoint(eager=True)
        # PQ training on residual subvectors — the ONE shared Lloyd loop
        # (similarity.pq_train_codebook) with the same pinned-predicate
        # init the flat-PQ specs use (init = first PQ_K vectors' residual
        # subvectors, one DECIMAL-mean update, bounded codebook collect)
        cb1 = pq_train_codebook(
            rsubs.select("vec_id", "sub", "semb"),
            PQ_K,
            init_predicate=F.col("vec_id") < PQ_K,
        ).localCheckpoint(eager=True)
        codes = (
            _pq_assign(rsubs.select("vec_id", "sub", "semb"), cb1)
            .select("vec_id", "sub", "code")
            .join(assign, "vec_id")
            .localCheckpoint(eager=True)
        )
        return (assign, cent_arr, rsubs, cb1, codes)

    return _memo_get(_IVFPQ_INDEX_CACHE, spark, sf_dir, build)


def ivf_pq_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full IVF-PQ index — the production 100 TB ANN shape — with
    EVERY stage cross-engine value-checked: coarse cells from the
    deterministic portable quantizer (``embedding_ivf_portable``'s
    lowest-vec_id centroids + the proven argmin assignment), PQ trained
    on the RESIDUALS (x − coarse_centroid, the Jégou et al. IVFADC
    variant — residuals are centered, so the same code budget buys less
    distortion), nprobe=1 own-cell probing, and ADC reranking of the
    probed cell entirely from the code table. Output: (query_id,
    cand_id, rank, adc_distance), top ``IVFPQ_TOPK`` per query.

    Why this matters at 100 TB: IVF prunes WHICH partitions a probe
    reads (files-read == probed-cell union — measured flat at 1×/10×/
    100× for the at-rest layout); PQ shrinks what every SURVIVING row
    costs (M code bytes instead of 4·dim). This spec is the composed
    plan: cell-pruned scan → code join → ADC rerank, no raw vectors
    touched after encoding. The at-rest production path stores the
    codes as layout columns beside the cell partitioning; here every
    stage stays in one lineage so DuckDB reproduces it bit-for-bit.

    Plan/scale: both codebooks broadcast (coarse k + M·k·(dim/M)
    doubles); residuals are a zip_with projection (no shuffle); the
    probe join shuffles on the cell id exactly like
    ``embedding_ivf_portable``; ADC is the conditional-sum aggregate
    keyed by (query, candidate) within a cell — |cell| candidates per
    query, never all-pairs. Index side via ``_ivfpq_index_cached``."""
    from nbi_oedi_etl_spark.operators.similarity import l2_distance

    _assign, _cent_arr, rsubs, cb1, codes = _ivfpq_index_cached(spark, sf_dir)

    q = rsubs.where(F.col("vec_id") < IVFPQ_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        "cell",
        "sub",
        F.col("semb").alias("q_semb"),
    )
    d = (
        codes.join(F.broadcast(cb1), ["sub", "code"])
        .join(F.broadcast(q), ["cell", "sub"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "sub",
            (
                l2_distance(F.col("q_semb"), F.col("c_emb"))
                * l2_distance(F.col("q_semb"), F.col("c_emb"))
            ).alias("d2"),
        )
    )
    return _adc_topk(d, IVFPQ_TOPK, "cand_id")


IVF_PQ_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), c AS (
  SELECT vec_id AS centroid_id, emb AS c_emb FROM e WHERE vec_id < {IVFPQ_COARSE_K}
), dc AS (
  SELECT e.vec_id, c.centroid_id, list_distance(e.emb, c.c_emb) AS dist
  FROM e CROSS JOIN c
), assign AS (
  SELECT vec_id, centroid_id AS cell FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
    FROM dc
  ) WHERE rn = 1
), rsubs AS (
  SELECT b.vec_id, b.cell, s AS sub,
         list_transform(range(1, {PQ_DSUB} + 1),
                        i -> b.emb[s * {PQ_DSUB} + i] - b.c_emb[s * {PQ_DSUB} + i])
           AS semb
  FROM (SELECT e.vec_id, a.cell, e.emb, c.c_emb
        FROM e JOIN assign a USING (vec_id)
        JOIN c ON c.centroid_id = a.cell) b,
       unnest(range({PQ_M})) t(s)
), cb0 AS (
  SELECT sub, vec_id AS code, semb AS c_emb FROM rsubs WHERE vec_id < {PQ_K}
), a0 AS (
  SELECT vec_id, sub, semb, code FROM (
    SELECT r.vec_id, r.sub, r.semb, cb.code,
           row_number() OVER (PARTITION BY r.vec_id, r.sub
                              ORDER BY list_distance(r.semb, cb.c_emb),
                                       cb.code) AS rn
    FROM rsubs r JOIN cb0 cb ON cb.sub = r.sub
  ) WHERE rn = 1
), cb1 AS (
  SELECT sub, code, list(m ORDER BY d) AS c_emb FROM (
    SELECT sub, code, d,
           CAST(sum(CAST(semb[d] AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS m
    FROM (SELECT sub, code, semb,
                 unnest(range(1, len(semb) + 1)) AS d FROM a0)
    GROUP BY sub, code, d
  ) GROUP BY sub, code
), codes AS (
  SELECT vec_id, sub, code, cell FROM (
    SELECT r.vec_id, r.sub, r.cell, cb.code,
           row_number() OVER (PARTITION BY r.vec_id, r.sub
                              ORDER BY list_distance(r.semb, cb.c_emb),
                                       cb.code) AS rn
    FROM rsubs r JOIN cb1 cb ON cb.sub = r.sub
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, cell, sub, semb AS q_semb
  FROM rsubs WHERE vec_id < {IVFPQ_N_QUERIES}
), dd AS (
  SELECT q.query_id, a.vec_id, a.sub,
         list_distance(q.q_semb, cb.c_emb)
           * list_distance(q.q_semb, cb.c_emb) AS d2
  FROM codes a
  JOIN cb1 cb ON cb.sub = a.sub AND cb.code = a.code
  JOIN q ON q.sub = a.sub AND q.cell = a.cell
  WHERE a.vec_id <> q.query_id
), adc AS (
  SELECT query_id, vec_id,
         sqrt(sum(CASE WHEN sub = 0 THEN d2 END)
              + sum(CASE WHEN sub = 1 THEN d2 END)
              + sum(CASE WHEN sub = 2 THEN d2 END)
              + sum(CASE WHEN sub = 3 THEN d2 END)) AS adc
  FROM dd GROUP BY query_id, vec_id
), ranked AS (
  SELECT query_id, vec_id, adc,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc, vec_id) AS rank
  FROM adc
)
SELECT query_id, vec_id AS cand_id, CAST(rank AS BIGINT) AS rank,
       round(adc, 6) AS adc_distance
FROM ranked WHERE rank <= {IVFPQ_TOPK}
"""


# ------------------------------------------ IVF-PQ recall/cost curve

#: n_probe sweep points for the recall curve. The top level equals
#: ``IVFPQ_COARSE_K`` (= probe every cell), so the curve's last point is
#: the flat-PQ ceiling — recall below 1.0 there is pure quantization
#: loss, and the gap between levels is the coarse quantizer's miss rate.
IVFPQ_NPROBE_LEVELS = [1, 2, 4, 8]


def ivf_pq_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@``IVFPQ_TOPK`` versus probe width for the full IVFADC
    composition — the quality/cost trade a 100 TB ANN operator tunes
    FIRST (VERDICT r12 optional 7): one row per ``n_probe`` ∈
    ``IVFPQ_NPROBE_LEVELS`` with the mean recall against the exact
    brute-force L2 top-k and the mean number of ADC candidates scored
    (the probe's cost axis: candidates ≈ rows read from the probed-cell
    union of the at-rest layout).

    The index side is ``ivf_pq_portable``'s exact lineage (deterministic
    portable coarse quantizer, residual-PQ codebook, dense codes); the
    probe side generalizes it from nprobe=1 own-cell to the ranked
    multi-cell probe: per query, cells ranked by centroid distance, and
    for every probed cell the query residual is taken against THAT
    cell's centroid (the Jégou IVFADC probe — residuals are
    per-probed-cell, not per-query).

    Plan/scale: codebooks + the (query × probed-cell) residual
    subvector table are broadcast (bounded: queries × n_probe_max × M
    rows); the candidate join shuffles on the cell id exactly like the
    layout probe; the level explode multiplies candidates by
    |levels| ≤ 4 BEFORE the partial-aggregating groupBy, never the
    corpus; ground truth is the bounded broadcast-queries brute-force
    shape shared with ``pq_recall_audit``. Recall/cost aggregate to
    |levels| rows via integer counts, so the floats hash cross-engine.
    Index side via ``_ivfpq_index_cached`` (shared with
    ``ivf_pq_portable`` — one codebook training per session).
    """
    from nbi_oedi_etl_spark.operators.similarity import l2_distance

    emb = read_table(spark, sf_dir, "embeddings")
    _assign, cent_arr, _rsubs, cb1, codes = _ivfpq_index_cached(spark, sf_dir)

    # ranked multi-cell probe: per query, cells by centroid distance;
    # query residual per PROBED cell
    qv = emb.where(F.col("vec_id") < IVFPQ_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("q_emb"),
    )
    pw = Window.partitionBy("query_id").orderBy(F.asc("pd"), F.asc("cell"))
    probes = (
        qv.crossJoin(F.broadcast(cent_arr))
        .select(
            "query_id",
            "q_emb",
            "cell",
            "cent_emb",
            l2_distance(F.col("q_emb"), F.col("cent_emb")).alias("pd"),
        )
        .withColumn("probe_rank", F.row_number().over(pw))
        .where(F.col("probe_rank") <= max(IVFPQ_NPROBE_LEVELS))
        .select(
            "query_id",
            "cell",
            "probe_rank",
            F.zip_with("q_emb", "cent_emb", lambda x, y: x - y).alias("qres"),
        )
    )
    qsubs = probes.select(
        "query_id",
        "cell",
        "probe_rank",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {PQ_M - 1}),"
                f" s -> slice(qres, s * {PQ_DSUB} + 1, {PQ_DSUB}))"
            )
        ).alias("sub", "q_semb"),
    )
    d = (
        codes.join(F.broadcast(cb1), ["sub", "code"])
        .join(F.broadcast(qsubs), ["cell", "sub"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "sub",
            "probe_rank",
            (
                l2_distance(F.col("q_semb"), F.col("c_emb"))
                * l2_distance(F.col("q_semb"), F.col("c_emb"))
            ).alias("d2"),
        )
    )
    dl = d.withColumn(
        "n_probe",
        F.explode(F.array(*[F.lit(v) for v in IVFPQ_NPROBE_LEVELS])),
    ).where(F.col("probe_rank") <= F.col("n_probe"))
    sub_d2 = [
        F.sum(F.when(F.col("sub") == s, F.col("d2"))).alias(f"d2_{s}")
        for s in range(PQ_M)
    ]
    adc = dl.groupBy("n_probe", "query_id", "vec_id").agg(*sub_d2)
    total = F.col("d2_0")
    for s in range(1, PQ_M):
        total = total + F.col(f"d2_{s}")
    adc = adc.select("n_probe", "query_id", "vec_id", F.sqrt(total).alias("adc"))
    aw = Window.partitionBy("n_probe", "query_id").orderBy(
        F.asc("adc"), F.asc("vec_id")
    )
    approx = (
        adc.withColumn("rank", F.row_number().over(aw))
        .where(F.col("rank") <= IVFPQ_TOPK)
        .select("n_probe", "query_id", F.col("vec_id").alias("cand_id"))
    )

    # exact ground truth (rounded-then-ranked, the pq_recall_audit rule)
    bf = (
        emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        .crossJoin(F.broadcast(qv))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.round(l2_distance(F.col("q_emb"), F.col("emb")), 6).alias("d"),
        )
    )
    bw = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("cand_id"))
    exact = (
        bf.withColumn("rank", F.row_number().over(bw))
        .where(F.col("rank") <= IVFPQ_TOPK)
        .select("query_id", "cand_id", F.lit(1).alias("_hit"))
    )

    hits = (
        approx.join(exact, ["query_id", "cand_id"], "left")
        .groupBy("n_probe")
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).alias("hits"))
    )
    cands = adc.groupBy("n_probe").agg(F.count(F.lit(1)).alias("n_cand"))
    qn = qv.agg(F.count(F.lit(1)).alias("n_queries"))
    return (
        hits.join(cands, "n_probe")
        .crossJoin(F.broadcast(qn))
        .select(
            F.col("n_probe").cast("int").alias("n_probe"),
            "n_queries",
            F.round(
                F.col("hits") * F.lit(1.0)
                / (F.col("n_queries") * F.lit(IVFPQ_TOPK)),
                6,
            ).alias(f"recall_at_{IVFPQ_TOPK}"),
            F.round(
                F.col("n_cand") * F.lit(1.0) / F.col("n_queries"), 6
            ).alias("avg_candidates"),
        )
    )


IVF_PQ_RECALL_CURVE_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), c AS (
  SELECT vec_id AS centroid_id, emb AS c_emb FROM e WHERE vec_id < {IVFPQ_COARSE_K}
), dc AS (
  SELECT e.vec_id, c.centroid_id, list_distance(e.emb, c.c_emb) AS dist
  FROM e CROSS JOIN c
), assign AS (
  SELECT vec_id, centroid_id AS cell FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
    FROM dc
  ) WHERE rn = 1
), rsubs AS (
  SELECT b.vec_id, b.cell, s AS sub,
         list_transform(range(1, {PQ_DSUB} + 1),
                        i -> b.emb[s * {PQ_DSUB} + i] - b.c_emb[s * {PQ_DSUB} + i])
           AS semb
  FROM (SELECT e.vec_id, a.cell, e.emb, c.c_emb
        FROM e JOIN assign a USING (vec_id)
        JOIN c ON c.centroid_id = a.cell) b,
       unnest(range({PQ_M})) t(s)
), cb0 AS (
  SELECT sub, vec_id AS code, semb AS c_emb FROM rsubs WHERE vec_id < {PQ_K}
), a0 AS (
  SELECT vec_id, sub, semb, code FROM (
    SELECT r.vec_id, r.sub, r.semb, cb.code,
           row_number() OVER (PARTITION BY r.vec_id, r.sub
                              ORDER BY list_distance(r.semb, cb.c_emb),
                                       cb.code) AS rn
    FROM rsubs r JOIN cb0 cb ON cb.sub = r.sub
  ) WHERE rn = 1
), cb1 AS (
  SELECT sub, code, list(m ORDER BY d) AS c_emb FROM (
    SELECT sub, code, d,
           CAST(sum(CAST(semb[d] AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS m
    FROM (SELECT sub, code, semb,
                 unnest(range(1, len(semb) + 1)) AS d FROM a0)
    GROUP BY sub, code, d
  ) GROUP BY sub, code
), codes AS (
  SELECT vec_id, sub, code, cell FROM (
    SELECT r.vec_id, r.sub, r.cell, cb.code,
           row_number() OVER (PARTITION BY r.vec_id, r.sub
                              ORDER BY list_distance(r.semb, cb.c_emb),
                                       cb.code) AS rn
    FROM rsubs r JOIN cb1 cb ON cb.sub = r.sub
  ) WHERE rn = 1
), qv AS (
  SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < {IVFPQ_N_QUERIES}
), probes AS (
  SELECT query_id, cell, probe_rank, q_emb, c_emb FROM (
    SELECT qv.query_id, c.centroid_id AS cell, c.c_emb, qv.q_emb,
           row_number() OVER (PARTITION BY qv.query_id
                              ORDER BY list_distance(qv.q_emb, c.c_emb),
                                       c.centroid_id) AS probe_rank
    FROM qv CROSS JOIN c
  ) WHERE probe_rank <= {max(IVFPQ_NPROBE_LEVELS)}
), qsubs AS (
  SELECT p.query_id, p.cell, p.probe_rank, s AS sub,
         list_transform(range(1, {PQ_DSUB} + 1),
                        i -> p.q_emb[s * {PQ_DSUB} + i] - p.c_emb[s * {PQ_DSUB} + i])
           AS q_semb
  FROM probes p, unnest(range({PQ_M})) t(s)
), dd AS (
  SELECT q.query_id, a.vec_id, a.sub, q.probe_rank,
         list_distance(q.q_semb, cb.c_emb)
           * list_distance(q.q_semb, cb.c_emb) AS d2
  FROM codes a
  JOIN cb1 cb ON cb.sub = a.sub AND cb.code = a.code
  JOIN qsubs q ON q.sub = a.sub AND q.cell = a.cell
  WHERE a.vec_id <> q.query_id
), lv AS (
  SELECT unnest([{", ".join(str(v) for v in IVFPQ_NPROBE_LEVELS)}]) AS n_probe
), dl AS (
  SELECT lv.n_probe, dd.* FROM dd JOIN lv ON dd.probe_rank <= lv.n_probe
), adc AS (
  SELECT n_probe, query_id, vec_id,
         sqrt(sum(CASE WHEN sub = 0 THEN d2 END)
              + sum(CASE WHEN sub = 1 THEN d2 END)
              + sum(CASE WHEN sub = 2 THEN d2 END)
              + sum(CASE WHEN sub = 3 THEN d2 END)) AS adc
  FROM dl GROUP BY n_probe, query_id, vec_id
), approx AS (
  SELECT n_probe, query_id, vec_id AS cand_id FROM (
    SELECT n_probe, query_id, vec_id,
           row_number() OVER (PARTITION BY n_probe, query_id
                              ORDER BY adc, vec_id) AS rank
    FROM adc
  ) WHERE rank <= {IVFPQ_TOPK}
), bf AS (
  SELECT qv.query_id, e.vec_id AS cand_id,
         round(list_distance(qv.q_emb, e.emb), 6) AS d
  FROM e CROSS JOIN qv WHERE e.vec_id <> qv.query_id
), exact AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
           row_number() OVER (PARTITION BY query_id ORDER BY d, cand_id) AS rank
    FROM bf
  ) WHERE rank <= {IVFPQ_TOPK}
), hits AS (
  SELECT a.n_probe, count(x.cand_id) AS hits
  FROM approx a
  LEFT JOIN exact x ON x.query_id = a.query_id AND x.cand_id = a.cand_id
  GROUP BY a.n_probe
), cands AS (
  SELECT n_probe, count(*) AS n_cand FROM adc GROUP BY n_probe
), qn AS (
  SELECT count(*) AS n_queries FROM qv
)
SELECT CAST(h.n_probe AS INT) AS n_probe,
       qn.n_queries,
       round(h.hits / (qn.n_queries * {IVFPQ_TOPK}), 6) AS recall_at_{IVFPQ_TOPK},
       round(cd.n_cand / qn.n_queries, 6) AS avg_candidates
FROM hits h JOIN cands cd USING (n_probe) CROSS JOIN qn
"""


# --------------------------------------- LSH banding recall/cost curve

#: rows-per-band sweep for the banding curve over the 8-slot portable
#: signature: r ∈ {1,2,4,8} ⇒ b = 8/r bands. The S-curve
#: P(candidate | J=s) = 1 − (1 − s^r)^b is THE dedup tuning knob at
#: 100 TB; this spec is its measured counterpart on the corpus itself.
LSH_CURVE_ROWS_PER_BAND = [1, 2, 4, 8]

#: ground-truth similarity threshold — matches workload_ext22._TAU so
#: the truth side IS the oracled exact prefix-filter join.
LSH_CURVE_TAU = 0.5


def lsh_banding_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate recall / precision / cost versus banding configuration
    for MinHash-LSH — the dedup family's quality/cost curve, completing
    the per-tier measurement trio (`ann_recall_portable` for IVF,
    `pq_recall_audit` + `ivf_pq_recall_curve` for PQ, this for LSH).

    For each rows-per-band r ∈ ``LSH_CURVE_ROWS_PER_BAND`` (b = 8/r
    bands over the shared 8-slot portable signature), candidates are
    pairs agreeing on ALL r slots of at least one band; ground truth is
    the EXACT 3-gram-shingle Jaccard ≥ τ pair set from the prefix-filter
    join (`doc_jaccard_prefix_join` — guaranteed-complete, never
    all-pairs). One row per config: candidate count (the verification
    cost a banding choice buys), recall and precision against truth.
    The theory curve P = 1 − (1−s^r)^b says small r over-generates and
    large r misses; this measures where THIS corpus sits.

    Plan/scale: signatures are the memoized
    `portable_signatures_cached` table; band keys are slot-tuple
    strings sliced from one array column (15 band rows per doc across
    all 4 configs); the candidate join is the standard banded
    self-equi-join on (r, band_id, band_key) — never all-pairs; truth
    reuses the prefix-filter plan; recall/precision aggregate through
    integer hit/candidate counts, so the floats hash cross-engine.

    Exactness: band-key equality ⟺ slot-tuple equality (plain decimal
    string concat, no hashing on the compare path); counts are BIGINT;
    the two final divisions are identical single double-divisions
    rounded to 6 (denominators guarded with greatest(·,1) identically
    in both engines)."""
    from nbi_oedi_etl_spark.workload_ext import portable_signatures_cached
    from nbi_oedi_etl_spark.workload_ext22 import doc_jaccard_prefix_join

    sig = portable_signatures_cached(spark, sf_dir)
    arr = F.array(*[F.col(f"m{i}").cast("string") for i in range(8)])
    band_rows = []
    for r in LSH_CURVE_ROWS_PER_BAND:
        for j in range(8 // r):
            band_rows.append(
                F.struct(
                    F.lit(r).alias("r"),
                    F.lit(j).alias("band_id"),
                    F.concat_ws("|", F.slice(arr, j * r + 1, r)).alias("bk"),
                )
            )
    bands = sig.select(
        "doc_id", F.explode(F.array(*band_rows)).alias("b")
    ).select("doc_id", "b.r", "b.band_id", "b.bk")
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.r") == F.col("b.r"))
            & (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.r").alias("r"), F.col("a.doc_id").alias("u"), F.col("b.doc_id").alias("v"))
        .distinct()
    )
    truth = doc_jaccard_prefix_join(spark, sf_dir).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v"), F.lit(1).alias("_hit")
    )
    per_r = (
        cand.join(truth, ["u", "v"], "left")
        .groupBy("r")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("hits"),
        )
    )
    nt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    return (
        per_r.crossJoin(F.broadcast(nt))
        .select(
            F.col("r").cast("int").alias("rows_per_band"),
            (F.lit(8) / F.col("r")).cast("int").alias("n_bands"),
            "n_candidates",
            "n_truth",
            F.round(
                F.col("hits") * F.lit(1.0) / F.greatest(F.col("n_truth"), F.lit(1)), 6
            ).alias("recall"),
            F.round(
                F.col("hits") * F.lit(1.0)
                / F.greatest(F.col("n_candidates"), F.lit(1)),
                6,
            ).alias("precision"),
        )
    )


LSH_BANDING_CURVE_ORACLE = rf"""
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
), sigarr AS (
  SELECT doc_id, list(m::VARCHAR ORDER BY seed) AS arr FROM hs GROUP BY doc_id
), cfg AS (
  SELECT unnest([{", ".join(str(r) for r in LSH_CURVE_ROWS_PER_BAND)}]) AS r
), bands AS (
  SELECT g.doc_id, c.r, j.j AS band_id,
         array_to_string(list_slice(g.arr, j.j * c.r + 1, j.j * c.r + c.r), '|') AS bk
  FROM sigarr g, cfg c, range(8) j(j) WHERE j.j < 8 // c.r
), cand AS (
  SELECT DISTINCT a.r, a.doc_id AS u, b.doc_id AS v
  FROM bands a
  JOIN bands b ON a.r = b.r AND a.band_id = b.band_id AND a.bk = b.bk
              AND a.doc_id < b.doc_id
), sz AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), truth AS (
  SELECT u, v FROM inter
  JOIN sz sa ON sa.doc_id = u
  JOIN sz sb ON sb.doc_id = v
  WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= {LSH_CURVE_TAU}
), agg AS (
  SELECT cd.r, count(*) AS n_candidates, count(t.u) AS hits
  FROM cand cd LEFT JOIN truth t ON t.u = cd.u AND t.v = cd.v
  GROUP BY cd.r
), nt AS (
  SELECT count(*) AS n_truth FROM truth
)
SELECT CAST(a.r AS INT) AS rows_per_band,
       CAST(8 // a.r AS INT) AS n_bands,
       a.n_candidates,
       nt.n_truth,
       round(a.hits / greatest(nt.n_truth, 1), 6) AS recall,
       round(a.hits / greatest(a.n_candidates, 1), 6) AS precision
FROM agg a CROSS JOIN nt
"""


# ------------------------------------------- IVF exact recall curve

def ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@``IVFPQ_TOPK`` versus probe width for the EXACT IVF tier
    (raw vectors in the probed cells, no quantization) — the companion
    to ``ivf_pq_recall_curve`` that DECOMPOSES the compressed tier's
    recall loss: at each ``n_probe``, (this curve) − (the ADC curve) is
    pure PQ distortion, while 1 − (this curve) is pure coarse-quantizer
    miss. By construction this curve reaches 1.0 at
    n_probe = IVFPQ_COARSE_K (probing every cell IS brute force), so
    the two endpoints pin both loss terms.

    Plan/scale: same cell-keyed candidate shape as the ADC curve —
    probed-cell equi-join against the corpus, never all-pairs; the
    coarse assignment comes from the shared memoized
    ``_ivfpq_index_cached`` (zero extra training); exact distances are
    the proven index-order fold; recall/cost aggregate through integer
    counts."""
    from nbi_oedi_etl_spark.operators.similarity import l2_distance

    emb = read_table(spark, sf_dir, "embeddings")
    assign, cent_arr, _rsubs, _cb1, _codes = _ivfpq_index_cached(spark, sf_dir)
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).join(assign, "vec_id")

    qv = emb.where(F.col("vec_id") < IVFPQ_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("q_emb"),
    )
    pw = Window.partitionBy("query_id").orderBy(F.asc("pd"), F.asc("cell"))
    probes = (
        qv.crossJoin(F.broadcast(cent_arr))
        .select(
            "query_id",
            "q_emb",
            "cell",
            l2_distance(F.col("q_emb"), F.col("cent_emb")).alias("pd"),
        )
        .withColumn("probe_rank", F.row_number().over(pw))
        .where(F.col("probe_rank") <= max(IVFPQ_NPROBE_LEVELS))
        .select("query_id", "cell", "probe_rank", "q_emb")
    )
    d = (
        e.join(F.broadcast(probes), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "probe_rank",
            F.round(l2_distance(F.col("q_emb"), F.col("emb")), 6).alias("d"),
        )
    )
    dl = d.withColumn(
        "n_probe",
        F.explode(F.array(*[F.lit(v) for v in IVFPQ_NPROBE_LEVELS])),
    ).where(F.col("probe_rank") <= F.col("n_probe"))
    aw = Window.partitionBy("n_probe", "query_id").orderBy(
        F.asc("d"), F.asc("vec_id")
    )
    approx = (
        dl.withColumn("rank", F.row_number().over(aw))
        .where(F.col("rank") <= IVFPQ_TOPK)
        .select("n_probe", "query_id", F.col("vec_id").alias("cand_id"))
    )

    bf = (
        emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        .crossJoin(F.broadcast(qv))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.round(l2_distance(F.col("q_emb"), F.col("emb")), 6).alias("d"),
        )
    )
    bw = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("cand_id"))
    exact = (
        bf.withColumn("rank", F.row_number().over(bw))
        .where(F.col("rank") <= IVFPQ_TOPK)
        .select("query_id", "cand_id", F.lit(1).alias("_hit"))
    )

    hits = (
        approx.join(exact, ["query_id", "cand_id"], "left")
        .groupBy("n_probe")
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).alias("hits"))
    )
    cands = dl.groupBy("n_probe").agg(F.count(F.lit(1)).alias("n_cand"))
    qn = qv.agg(F.count(F.lit(1)).alias("n_queries"))
    return (
        hits.join(cands, "n_probe")
        .crossJoin(F.broadcast(qn))
        .select(
            F.col("n_probe").cast("int").alias("n_probe"),
            "n_queries",
            F.round(
                F.col("hits") * F.lit(1.0)
                / (F.col("n_queries") * F.lit(IVFPQ_TOPK)),
                6,
            ).alias(f"recall_at_{IVFPQ_TOPK}"),
            F.round(
                F.col("n_cand") * F.lit(1.0) / F.col("n_queries"), 6
            ).alias("avg_candidates"),
        )
    )


IVF_RECALL_CURVE_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), c AS (
  SELECT vec_id AS centroid_id, emb AS c_emb FROM e WHERE vec_id < {IVFPQ_COARSE_K}
), dc AS (
  SELECT e.vec_id, c.centroid_id, list_distance(e.emb, c.c_emb) AS dist
  FROM e CROSS JOIN c
), assign AS (
  SELECT vec_id, centroid_id AS cell FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
    FROM dc
  ) WHERE rn = 1
), qv AS (
  SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < {IVFPQ_N_QUERIES}
), probes AS (
  SELECT query_id, cell, probe_rank, q_emb FROM (
    SELECT qv.query_id, c.centroid_id AS cell, qv.q_emb,
           row_number() OVER (PARTITION BY qv.query_id
                              ORDER BY list_distance(qv.q_emb, c.c_emb),
                                       c.centroid_id) AS probe_rank
    FROM qv CROSS JOIN c
  ) WHERE probe_rank <= {max(IVFPQ_NPROBE_LEVELS)}
), dd AS (
  SELECT p.query_id, a.vec_id, p.probe_rank,
         round(list_distance(p.q_emb, e2.emb), 6) AS d
  FROM assign a
  JOIN e e2 ON e2.vec_id = a.vec_id
  JOIN probes p ON p.cell = a.cell
  WHERE a.vec_id <> p.query_id
), lv AS (
  SELECT unnest([{", ".join(str(v) for v in IVFPQ_NPROBE_LEVELS)}]) AS n_probe
), dl AS (
  SELECT lv.n_probe, dd.* FROM dd JOIN lv ON dd.probe_rank <= lv.n_probe
), approx AS (
  SELECT n_probe, query_id, vec_id AS cand_id FROM (
    SELECT n_probe, query_id, vec_id,
           row_number() OVER (PARTITION BY n_probe, query_id
                              ORDER BY d, vec_id) AS rank
    FROM dl
  ) WHERE rank <= {IVFPQ_TOPK}
), bf AS (
  SELECT qv.query_id, e.vec_id AS cand_id,
         round(list_distance(qv.q_emb, e.emb), 6) AS d
  FROM e CROSS JOIN qv WHERE e.vec_id <> qv.query_id
), exact AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
           row_number() OVER (PARTITION BY query_id ORDER BY d, cand_id) AS rank
    FROM bf
  ) WHERE rank <= {IVFPQ_TOPK}
), hits AS (
  SELECT a.n_probe, count(x.cand_id) AS hits
  FROM approx a
  LEFT JOIN exact x ON x.query_id = a.query_id AND x.cand_id = a.cand_id
  GROUP BY a.n_probe
), cands AS (
  SELECT n_probe, count(*) AS n_cand FROM dl GROUP BY n_probe
), qn AS (
  SELECT count(*) AS n_queries FROM qv
)
SELECT CAST(h.n_probe AS INT) AS n_probe,
       qn.n_queries,
       round(h.hits / (qn.n_queries * {IVFPQ_TOPK}), 6) AS recall_at_{IVFPQ_TOPK},
       round(cd.n_cand / qn.n_queries, 6) AS avg_candidates
FROM hits h JOIN cands cd USING (n_probe) CROSS JOIN qn
"""
