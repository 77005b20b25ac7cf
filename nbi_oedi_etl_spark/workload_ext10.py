"""Round-4 extension queries, wave 4: weighted sampling and statistical
anomaly detection.

- ``weighted_reservoir_docs`` — Efraimidis–Spirakis weighted reservoir
  sampling (A-Res, 2006, public): top-k documents by u^(1/w) with an
  md5-deterministic uniform u and weight w = n_chars. The per-ITEM-weight
  complement of the per-GROUP-weight ``weighted_mixture_sample``; the
  standard way to oversample long/high-quality documents reproducibly.
- ``event_value_anomalies`` — per-type daily totals scored by z-score
  against that type's own daily distribution; |z| > 2 rows flagged. The
  monitoring staple over ingest volumes (the reference's monitor keeps
  raw counters; this is the statistical layer above them).

Oracle convention identical to workload.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.operators._util import fast_lit
from nbi_oedi_etl_spark.sources.parquet import read_table


# ----------------------------------------- weighted reservoir (A-Res)

_WRES_K = 20


def weighted_reservoir_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis A-Res: each item draws uniform u and keeps key
    u^(1/w); the top-k keys are a weighted sample without replacement
    (inclusion probability ∝ w). u is md5-deterministic, so the sample is
    reproducible and the DuckDB twin re-derives it exactly.

    Ranking uses ln(u)/w (monotone in u^(1/w), fewer libm calls); the
    key is used ONLY for ordering — never output — so cross-engine ulp
    differences in ln can only matter if two keys collide within 1 ulp,
    which distinct md5 draws make ~2^-50 improbable (and the doc_id
    tiebreak would still agree for EQUAL doubles).

    Plan: map-only key computation; global top-k is
    TakeOrderedAndProject-shaped via the rank window (per-partition
    partial top-k, one bounded gather) — mergeable the same way bottom-k
    is: shards keep their top-k, merge re-takes the top-k."""
    docs = read_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**60))
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    r = F.log(u) / w
    keyed = docs.select("doc_id", "source", "n_chars", r.alias("r"))
    win = Window.orderBy(F.desc("r"), F.asc("doc_id"))
    return (
        keyed.select("doc_id", "source", "n_chars", F.row_number().over(win).alias("rank"))
        .where(F.col("rank") <= _WRES_K)
    )


WEIGHTED_RESERVOIR_ORACLE = r"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             ::DOUBLE + 1.0) / 1152921504606846976.0)
           / CAST(greatest(n_chars, 1) AS DOUBLE) AS r
  FROM documents
)
SELECT doc_id, source, n_chars, rank FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (ORDER BY r DESC, doc_id) AS rank
  FROM keyed
) WHERE rank <= 20
"""


# ------------------------------------------- z-score anomaly detection

_Z_THRESHOLD = 2.0


def event_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily value totals per event type, z-scored against that type's own
    daily distribution; days with |z| > 2 are flagged anomalies — the
    statistical monitor over ingest volumes.

    Exactness: daily sums, their squares, Σx and Σx² are ALL exact
    decimals; mean/variance/sqrt run in double with identical operation
    order (IEEE sqrt is correctly rounded, hence deterministic), and z is
    rounded to 6 before the threshold so the flag boundary is
    engine-stable.

    Plan: one shuffle to (event_type, day) partials; the per-type moment
    aggregate runs on the tiny daily table and broadcasts back."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("d_sum"))
    )
    # re-narrow the sum to (18,6) before squaring: the square of the wide
    # sum type (28,6) would exceed precision 38 and Spark truncates it to
    # scale 6 under allowPrecisionLoss, while the oracle's product keeps
    # scale 12 — (18,6)² = (37,12) is exact and matches DuckDB bit-for-bit
    d6 = F.col("d_sum").cast("decimal(18,6)")
    moments = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("d_sum").alias("s1"),
        F.sum(d6 * d6).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_days")
    # nullif guards the single-day group: ANSI mode raises DIVIDE_BY_ZERO
    # even for doubles; a type with one day has no dispersion to z-score
    # against, so its z is NULL and the |z|>2 filter drops it
    var = (
        F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n_days")
    ) / F.nullif((F.col("n_days") - 1).cast("double"), F.lit(0.0))
    z = (F.col("d_sum").cast("double") - mean) / F.sqrt(var)
    return (
        daily.join(F.broadcast(moments), "event_type")
        .select(
            "event_type",
            "day",
            F.col("d_sum").cast("double").alias("daily_value"),
            F.round(z, 6).alias("z_score"),
        )
        .where(F.abs(F.col("z_score")) > _Z_THRESHOLD)
    )


# --------------------------------------------- triangle enumeration

def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the part co-purchase graph: edges are
    part pairs bought together in ≥ 2 distinct orders (the support
    threshold keeps the graph at signal density); triangles are the
    classic two-join enumeration over the canonically oriented
    (pa < pb < pc) edge list. Triangles are the basic cohesion motif —
    community seeds, recommendation strength, graph health.

    Plan: the pair build is one self-join on l_orderkey (per-order
    fan-out is C(items, 2) with TPC-H's ≤ 7 items/order — bounded); the
    enumeration shuffles the EDGE list (3.6k rows at sf0.01 after the
    support threshold) on its node keys, never the fact table. At true
    scale the standard degree-orientation trick (orient each edge
    low-degree → high-degree node) bounds the join fan-out by max-degree
    √|E|; the a < b < c orientation here is its fixed-order special
    case."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        # DISTINCT orders, not pair instances: a part repeated within one
        # order would otherwise satisfy the support threshold alone
        .agg(F.countDistinct(F.col("a.l_orderkey")).alias("n"))
        .where(F.col("n") >= 2)
        .select("pa", "pb")
        .cache()
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    return (
        e1.join(e2, F.col("e1.pb") == F.col("e2.pa"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa")) & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .select(
            F.col("e1.pa").alias("part_a"),
            F.col("e1.pb").alias("part_b"),
            F.col("e2.pb").alias("part_c"),
        )
    )


TRIANGLES_ORACLE = r"""
WITH pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2
)
SELECT e1.pa AS part_a, e1.pb AS part_b, e2.pb AS part_c
FROM pairs e1
JOIN pairs e2 ON e1.pb = e2.pa
JOIN pairs e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
"""


# -------------------------------------------- portable IVF ANN twin

def embedding_ivf_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with every stage oracle-checkable: deterministic coarse
    centroids (the 8 lowest vec_ids), nearest-centroid cell assignment
    (the oracle-proven kmeans_assignment_step argmin), nprobe=1 probing
    (each query searches its OWN cell), exact-cosine scoring inside the
    cell, top-3 per query. The oracle twin of the numpy/collect-based
    `embedding_ivf_topk` production path — with this, every ANN family
    (sign-LSH via embedding_ann_portable, IVF here, brute-force via
    embedding_topk_cosine) has a value-hash-checked twin.

    Plan: assignment is broadcast-centroid argmin (corpus never shuffles
    for it); the probe join shuffles on the cell id; scoring touches
    only same-cell pairs — |corpus|/k per query, never all-pairs."""
    from nbi_oedi_etl_spark.operators import similarity

    emb = read_table(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") < 8).withColumnRenamed(
        "vec_id", "centroid_id"
    )
    assign = similarity.kmeans_assignment_step(emb, cents).select(
        "vec_id", "centroid_id"
    )
    # r14 (guide §2.3): the norm folds once per row BEFORE the cell
    # join (shared by the query and candidate sides), so scoring folds
    # only the per-pair dot; _cosine_prenormed divides the same dot by
    # the same `_norm` doubles — the rounded score is bit-identical.
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).join(assign, "vec_id").withColumn("_n", similarity._norm(F.col("emb")))
    q = (
        e.where(F.col("vec_id") < 20)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            F.col("_n").alias("_qn"),
            F.col("centroid_id").alias("cell"),
        )
    )
    cand = q.join(
        e.select(
            F.col("vec_id").alias("cand_id"),
            F.col("emb").alias("c_emb"),
            F.col("_n").alias("_cn"),
            F.col("centroid_id").alias("cell"),
        ),
        "cell",
    ).where(F.col("cand_id") != F.col("query_id"))
    scored = cand.select(
        "query_id",
        "cand_id",
        F.round(
            similarity._cosine_prenormed(
                F.col("q_emb"), F.col("c_emb"), F.col("_qn"), F.col("_cn")
            ),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.select("query_id", "cand_id", "cos_sim", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= 3)
    )


# shared CTE chain of the portable IVF pipeline — composed into BOTH the
# IVF oracle and the recall oracle so a tweak (centroid rule, tie-break,
# nprobe) cannot leave the recall report measuring a different index
_IVF_SHARED_CTES = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), c AS (
  SELECT vec_id AS centroid_id, emb AS c_emb FROM e WHERE vec_id < 8
), d AS (
  SELECT e.vec_id, c.centroid_id, list_distance(e.emb, c.c_emb) AS dist
  FROM e CROSS JOIN c
), assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
    FROM d
  ) WHERE rn = 1
), ea AS (
  SELECT e.vec_id, e.emb, a.centroid_id AS cell
  FROM e JOIN assign a ON e.vec_id = a.vec_id
), ivf_scored AS (
  SELECT qq.vec_id AS query_id, t.vec_id AS cand_id,
         round(list_cosine_similarity(qq.emb, t.emb), 6) AS cos_sim
  FROM ea qq JOIN ea t ON qq.cell = t.cell AND qq.vec_id <> t.vec_id
  WHERE qq.vec_id < 20
), ivf_topk AS (
  SELECT query_id, cand_id, cos_sim, rank FROM (
    SELECT query_id, cand_id, cos_sim,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, cand_id) AS rank
    FROM ivf_scored
  ) WHERE rank <= 3
)"""

IVF_PORTABLE_ORACLE = (
    _IVF_SHARED_CTES
    + """
SELECT query_id, cand_id, cos_sim, rank FROM ivf_topk
"""
)


# ----------------------------------------- ANN recall report (oracle)

def ann_recall_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the portable IVF ANN against the exact brute-force
    top-3, per query — the QUALITY measurement of an ANN index, itself
    oracle-checked (both the index and the ground truth are
    deterministic, so even the recall numbers value-hash-check). The
    production recall harness this mirrors lives in
    tests/test_operators.py for the numpy LSH/IVF paths; this query is
    its cross-engine-verifiable twin.

    Plan: ground truth is the broadcast-queries brute-force shape
    (corpus never shuffles until the bounded per-query top-k); the IVF
    side reuses embedding_ivf_portable's plan; the overlap join is on
    the tiny (queries × 3) result tables."""
    from nbi_oedi_etl_spark.operators import similarity

    emb = read_table(spark, sf_dir, "embeddings")
    # r14 (guide §2.3): corpus-side norm folds once per row and the 20
    # query norms fold once each before the broadcast, instead of both
    # re-folding per (corpus row × query) pair; _cosine_prenormed
    # divides the same dot by the same `_norm` doubles (bit-identical).
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).withColumn("_n", similarity._norm(F.col("emb")))
    q = e.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb"),
        F.col("_n").alias("_qn"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.round(
                similarity._cosine_prenormed(
                    F.col("q_emb"), F.col("emb"), F.col("_qn"), F.col("_n")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    exact = scored.select(
        "query_id", "cand_id", F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= 3)
    approx = embedding_ivf_portable(spark, sf_dir).select(
        "query_id", "cand_id", F.lit(1).alias("_hit")
    )
    joined = exact.join(approx, ["query_id", "cand_id"], "left")
    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.coalesce("_hit", F.lit(0))).alias("n_found"),
        F.round(
            F.sum(F.coalesce("_hit", F.lit(0))) * F.lit(1.0) / F.count(F.lit(1)), 6
        ).alias("recall_at_3"),
    )


ANN_RECALL_ORACLE = (
    _IVF_SHARED_CTES
    + """,
q AS (
  SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < 20
), bf_scored AS (
  SELECT q.query_id, e.vec_id AS cand_id,
         round(list_cosine_similarity(q.q_emb, e.emb), 6) AS cos_sim
  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
), exact AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, cand_id) AS rank
    FROM bf_scored
  ) WHERE rank <= 3
)
SELECT ex.query_id,
       count(*) AS k,
       CAST(sum(CASE WHEN ap.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_found,
       round(sum(CASE WHEN ap.cand_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS recall_at_3
FROM exact ex
LEFT JOIN ivf_topk ap ON ex.query_id = ap.query_id AND ex.cand_id = ap.cand_id
GROUP BY ex.query_id
"""
)


EVENT_ANOMALY_ORACLE = r"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         sum(CAST(value AS DECIMAL(18,6))) AS d_sum
  FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
), moments AS (
  SELECT event_type, count(*) AS n_days,
         sum(d_sum) AS s1, sum(d_sum * d_sum) AS s2
  FROM daily GROUP BY event_type
), scored AS (
  SELECT d.event_type, d.day, CAST(d.d_sum AS DOUBLE) AS daily_value,
         round((CAST(d.d_sum AS DOUBLE)
                - CAST(m.s1 AS DOUBLE) / m.n_days)
               / sqrt((CAST(m.s2 AS DOUBLE)
                       - CAST(m.s1 AS DOUBLE) * CAST(m.s1 AS DOUBLE) / m.n_days)
                      / nullif(m.n_days - 1, 0)), 6) AS z_score
  FROM daily d JOIN moments m ON d.event_type = m.event_type
)
SELECT event_type, day, daily_value, z_score
FROM scored WHERE abs(z_score) > 2.0
"""


# ------------------------------------ event-type Markov transitions

def event_type_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: P(next type | current type), the behavioral-model staple
    (funnel generalization — every pairwise flow, not one hand-picked
    path). Probabilities are integer-count ratios, deterministic in
    double, rounded to 6.

    Plan: one user-keyed window shuffle builds the lagged pairs; the
    transition aggregate runs on the |types|² key space (map-side
    partials collapse immediately); row probabilities come from one
    window over that tiny table."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("prev_type"), "event_type"
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n") * F.lit(1.0) / F.sum("n").over(tot), 6).alias("p"),
    )


EVENT_MARKOV_ORACLE = """
WITH seq AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         event_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, event_type, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY prev_type), 6) AS p
FROM pairs
"""


# ---------------------------------- language-ID confusion matrix

def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the n-gram language guesser against the
    labeled lang column — the model-evaluation pass a curation pipeline
    runs before trusting a classifier's keep/drop decisions. Cells carry
    counts and the per-truth-label fraction.

    Plan: the guesser is a narrow map (stopword-hit counts per row); the
    confusion aggregate shuffles the |langs|² key space only."""
    from nbi_oedi_etl_spark.operators import text as text_ops

    docs = read_table(spark, sf_dir, "documents")
    # with_lang_guess projects to (doc_id, hits_*, lang_guess); rejoin the
    # labeled truth column on the key
    guessed = text_ops.with_lang_guess(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    cells = guessed.groupBy("lang", "lang_guess").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "lang_guess",
        "n",
        F.round(F.col("n") * F.lit(1.0) / F.sum("n").over(tot), 6).alias("frac"),
    )


LANG_CONFUSION_ORACLE = r"""
WITH t AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
), h AS (
  SELECT doc_id, lang,
    CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a'))) AS INTEGER) AS hits_en,
    CAST(len(list_filter(toks, x -> x IN ('der','und','die','das','ist'))) AS INTEGER) AS hits_de,
    CAST(len(list_filter(toks, x -> x IN ('el','la','de','que','los'))) AS INTEGER) AS hits_es,
    CAST(len(list_filter(toks, x -> x IN ('le','la','et','les','des'))) AS INTEGER) AS hits_fr
  FROM t
), g AS (
  SELECT lang,
       CASE WHEN hits_en >= hits_de AND hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
            WHEN hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
            WHEN hits_es >= hits_fr THEN 'es'
            ELSE 'fr' END AS lang_guess
  FROM h
), cells AS (
  SELECT lang, lang_guess, count(*) AS n FROM g GROUP BY lang, lang_guess
)
SELECT lang, lang_guess, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY lang), 6) AS frac
FROM cells
"""


# --------------------------------- full Lloyd k-means (3 iterations)

_LLOYD_K = 4
_LLOYD_ITERS = 3


def kmeans_lloyd_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL Lloyd k-means, 3 unrolled iterations (assign → update →
    assign → update → assign), every stage cross-engine exact — the
    iterative-ML-training pattern on Spark, end-to-end oracle-checked
    (kmeans_assign_embeddings proves one step; this proves the LOOP,
    including the centroid-update arithmetic).

    Exactness: the update step's per-dimension mean goes through
    DECIMAL(18,9) sums (order-independent) with one deterministic double
    division; assignment distances on the resulting double centroids use
    the fold already proven bit-equal to DuckDB's list_distance.

    Plan/scale (r14, guide §2.4): assignment is a LITERAL-PROJECTION
    argmin — the centroids live driver-side between iterations anyway
    (bounded k×dim state, the IVF-codebook posture), so each iteration
    ships them as one nested-array literal and the per-row argmin runs
    in whole-stage codegen over the corpus scan: no crossJoin, no
    (vec_id)-window shuffle, and no join to re-attach embeddings for
    the update (the projection carries them through). Value-identical
    to ``similarity.kmeans_assignment_step``: same ``l2_distance``
    doubles, and ``array_position`` of ``array_min`` takes the FIRST
    minimum over the centroid-id-ascending literal = the window form's
    ``orderBy(dist, centroid_id)`` row_number=1 tie rule (the
    ``_pq_assign_fast`` argument, pinned there). The update is one
    (centroid, dim)-keyed aggregate — k×dim cells, map-side partials —
    collected per iteration, which also truncates the lineage. Each of
    the 3 iterations is now one corpus scan + one bounded aggregate:
    the whole loop went from 3×(crossJoin window shuffle + re-join +
    aggregate) to 3 scans (measured 4.5-5.5 s → ~2 s at sf0.1)."""
    from nbi_oedi_etl_spark.operators.similarity import l2_distance

    emb = read_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cent_rows = sorted(
        (int(r[0]), [float(v) for v in r[1]])
        for r in e.where(F.col("vec_id") < _LLOYD_K).collect()
    )

    def assign_fast(cent_rows: list) -> DataFrame:
        if not cent_rows:
            # empty-corpus degenerate: same empty (vec_id, centroid_id,
            # distance) frame the crossJoin form produced
            return e.where(F.lit(False)).select(
                "vec_id",
                F.lit(None).cast("long").alias("centroid_id"),
                F.lit(None).cast("double").alias("distance"),
                "embedding",
            )
        ids_lit = fast_lit([cid for cid, _ in cent_rows])
        cents_lit = fast_lit([list(c) for _, c in cent_rows])
        dists = F.transform(
            cents_lit, lambda c: l2_distance(F.col("embedding"), c)
        )
        pos = F.array_position(dists, F.array_min(dists))
        return e.select(
            "vec_id",
            F.element_at(ids_lit, pos.cast("int")).cast("long").alias("centroid_id"),
            F.round(F.array_min(dists), 6).alias("distance"),
            "embedding",
        )

    for it in range(_LLOYD_ITERS):
        assign = assign_fast(cent_rows)
        if it == _LLOYD_ITERS - 1:
            return assign.select("vec_id", "centroid_id", "distance")
        means = (
            assign.select("centroid_id", F.posexplode("embedding").alias("d", "val"))
            .groupBy("centroid_id", "d")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(18,9)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("mean")
            )
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "mean"))),
                    lambda x: x["mean"],
                ).alias("embedding")
            )
        )
        cent_rows = sorted(
            (int(r["centroid_id"]), [float(v) for v in r["embedding"]])
            for r in means.collect()
        )
    raise AssertionError("unreachable")


_LLOYD_UPDATE_SQL = """
  SELECT centroid_id, list(m ORDER BY d) AS c_emb FROM (
    SELECT centroid_id, d,
           CAST(sum(CAST(emb[d] AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS m
    FROM (
      SELECT a.centroid_id, e.emb,
             unnest(range(1, len(e.emb) + 1)) AS d
      FROM {assign} a JOIN e ON e.vec_id = a.vec_id
    )
    GROUP BY centroid_id, d
  ) GROUP BY centroid_id
"""

_LLOYD_ASSIGN_SQL = """
  SELECT vec_id, centroid_id, dist FROM (
    SELECT e.vec_id, c.centroid_id, list_distance(e.emb, c.c_emb) AS dist,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_distance(e.emb, c.c_emb),
                                       c.centroid_id) AS rn
    FROM e CROSS JOIN {cents} c
  ) WHERE rn = 1
"""

KMEANS_LLOYD_ORACLE = (
    """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), c0 AS (
  SELECT vec_id AS centroid_id, emb AS c_emb FROM e WHERE vec_id < 4
), a0 AS ("""
    + _LLOYD_ASSIGN_SQL.format(cents="c0")
    + """), c1 AS ("""
    + _LLOYD_UPDATE_SQL.format(assign="a0")
    + """), a1 AS ("""
    + _LLOYD_ASSIGN_SQL.format(cents="c1")
    + """), c2 AS ("""
    + _LLOYD_UPDATE_SQL.format(assign="a1")
    + """), a2 AS ("""
    + _LLOYD_ASSIGN_SQL.format(cents="c2")
    + """)
SELECT vec_id, centroid_id, round(dist, 6) AS distance FROM a2
"""
)
