"""Round-4 extension queries, wave 6: sparse-vector similarity join,
document fingerprinting, semantic dedup, collocation mining, corpus
drift auditing, and evaluation-split tooling.

- ``doc_sparse_cosine_pairs`` — TF-IDF sparse cosine ALL-PAIRS
  similarity via an inverted-index self-join with document-frequency
  pruning (the Bayardo et al. WWW'07 posture): the sparse counterpart
  of the dense embedding near-dup family.
- ``winnowing_fingerprints`` — local document fingerprinting by
  winnowing (Schleimer et al. SIGMOD'03): rolling k-gram hashes, a
  sliding-window minimum selects a guaranteed-coverage 1/w-density
  fingerprint set. The plagiarism/contamination-detection primitive.
- ``semantic_dedup_cells`` — SemDeDup (Abbas et al. 2023): k-means
  cells bound the all-pairs cosine search; within-cell near-identical
  embeddings are dropped keeping the lowest id. Embedding-space
  near-dup REMOVAL (the dense twin of near_dup_keep_best).
- ``token_pmi_bigrams`` — pointwise mutual information over adjacent
  token bigrams: the classic collocation / multi-word-expression miner
  (tokenizer-merge candidate signal, complements bpe_merge_candidates
  which ranks by raw frequency).
- ``source_lang_kl_drift`` — per-source KL divergence of the language
  distribution against the corpus marginal: the dataset-mixture drift
  audit run before/after each ingest wave.
- ``kfold_assignment`` — deterministic 5-fold cross-validation split
  audit (md5 hash → fold), counts and char volume per (fold, source):
  the stratification-balance check on evaluation splits.
- ``dup_cluster_size_histogram`` — duplicate-cluster size distribution
  over the portable near-dup components: the dedup monitoring rollup
  (how much volume do the biggest duplicate families hold?). Reuses the
  memoized pair+closure stages.

Oracle convention identical to workload.py: DuckDB twin per query, all
output columns scalar-typed, aggregates aliased identically on both
sides. Float determinism follows the char_bigram_lm_score recipe:
``ln``/cosine intermediates are rounded once to 9 decimals into exact
DECIMAL arithmetic, only the final surfaced value is a round(…, 6)
double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table

# ---------------------------- TF-IDF sparse cosine similarity pairs


def doc_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs sparse cosine similarity over TF-IDF document vectors via
    an inverted-index self-join — the lexical near-dup detector that
    catches paraphrase-level overlap MinHash misses (shingles must match
    exactly; TF-IDF cosine only needs shared vocabulary mass).

    Plan/scale (the Bayardo et al. WWW'07 all-pairs posture): document
    frequency PRUNES the index first — tokens appearing in >30% of docs
    (stop-mass, the quadratic-blowup drivers) and hapax tokens (df<2,
    can't co-occur) never enter the join. The join shuffles on term, so
    the per-term fan-out is bounded by the pruned posting-list length;
    pair dots then aggregate on (doc_a, doc_b). At 100 TB the df cut is
    the knob: posting lists cap at df_max, so candidate volume is
    Σ df_i² over surviving terms, not |docs|².

    Exactness: idf = ln(N/df) rounded once to 9 decimals; weights and
    their products stay in DECIMAL (15,9)→(31,18) — exact, order-free;
    norms are exact decimal sums of squared weights; only the final
    cosine divides through doubles and rounds to 6 (IEEE-identical in
    both engines on identical inputs).
    """
    docs = read_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: t != "")
        ).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.count()  # tiny scalar; at scale a cached one-row agg
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # df-pruned index: 2 <= df <= 0.3*N  (exact integer comparison)
    kept = dfreq.where((F.col("df") >= 2) & (F.col("df") * 10 <= n_docs * 3))
    idf9 = F.round(
        F.log(F.lit(float(n_docs)) / F.col("df").cast("double")), 9
    ).cast("decimal(12,9)")
    weighted = tf.join(F.broadcast(kept), "term").select(
        "doc_id",
        "term",
        (F.col("tf").cast("decimal(6,0)") * idf9).cast("decimal(15,9)").alias("w"),
    )
    norms = weighted.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).alias("norm2")
    )
    a = weighted.select(
        F.col("doc_id").alias("doc_a"), "term", F.col("w").alias("wa")
    )
    b = weighted.select(
        F.col("doc_id").alias("doc_b"), "term", F.col("w").alias("wb")
    )
    dots = (
        a.join(b, "term")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("norm2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("norm2").alias("nb2"))
    cos = F.round(
        F.col("dot").cast("double")
        / F.sqrt(F.col("na2").cast("double") * F.col("nb2").cast("double")),
        6,
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", cos.alias("cosine"))
        .where(F.col("cosine") >= 0.3)
    )


SPARSE_COSINE_ORACLE = """
WITH terms AS (
  SELECT d.doc_id, t.term
  FROM documents d,
       LATERAL unnest(list_filter(string_split_regex(lower(d.text), '[^a-z]+'),
                                  x -> x != '')) AS t(term)
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
), n AS (
  SELECT count(*) AS n_docs FROM documents
), kept AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
  HAVING count(*) >= 2 AND count(*) * 10 <= (SELECT n_docs FROM n) * 3
), weighted AS (
  SELECT tf.doc_id, tf.term,
         CAST(CAST(tf.tf AS DECIMAL(6,0))
              * CAST(round(ln(CAST((SELECT n_docs FROM n) AS DOUBLE)
                              / CAST(kept.df AS DOUBLE)), 9) AS DECIMAL(12,9))
              AS DECIMAL(15,9)) AS w
  FROM tf JOIN kept USING (term)
), norms AS (
  SELECT doc_id, sum(w * w) AS norm2 FROM weighted GROUP BY doc_id
), dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w * b.w) AS dot
  FROM weighted a JOIN weighted b USING (term)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(CAST(dot AS DOUBLE)
             / sqrt(CAST(na.norm2 AS DOUBLE) * CAST(nb.norm2 AS DOUBLE)),
             6) AS cosine
FROM dots
JOIN norms na ON na.doc_id = doc_a
JOIN norms nb ON nb.doc_id = doc_b
WHERE round(CAST(dot AS DOUBLE)
            / sqrt(CAST(na.norm2 AS DOUBLE) * CAST(nb.norm2 AS DOUBLE)),
            6) >= 0.3
"""


# ------------------------------------------ winnowing fingerprints


def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. SIGMOD'03):
    k-gram (k=5) rolling hashes over the normalized text; each length-4
    window of consecutive k-gram hashes contributes its MINIMUM, giving a
    ~1/w-density fingerprint set with the guarantee that any match of
    length ≥ k+w-1 shares a fingerprint. The standard local-fingerprint
    primitive for plagiarism / contamination detection where shingle-set
    MinHash is too global.

    Plan/scale: 1-char rows (posexplode of a zero-width split — NEVER
    the substring-per-position formulation, which carries the whole
    document on every row: the O(len²) bytes pathology measured at 6.8 s
    on char_bigram_lm_score's first draft). The k-gram build (4 leads),
    the window minimum, and the full-window guard all sort by (doc_id,
    pos): ONE exchange + ONE sort, reused by every window in the chain.
    Hashes are the portable md5→60-bit-bigint bridge; everything after
    normalization is integer-exact.
    """
    docs = read_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.regexp_replace(F.lower("text"), "[^a-z0-9]", "").alias("c"),
    ).where(F.length("c") >= 9)  # k + w - 1 = 8 chars minimum, need >=1 window
    # n_grams rides along as ONE int per row (carrying the string `c`
    # itself per exploded row would be the O(len²) pathology; an int is
    # free) so no unbounded max(pos) window pass is needed later
    chars = d.select(
        "doc_id",
        (F.length("c") - 4).alias("n_grams"),
        F.posexplode(F.split("c", "(?!^)")).alias("pos", "ch"),
    ).where(F.col("ch") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = chars.select(
        "doc_id",
        "n_grams",
        "pos",
        F.concat(
            "ch",
            F.lead("ch", 1).over(w),
            F.lead("ch", 2).over(w),
            F.lead("ch", 3).over(w),
            F.lead("ch", 4).over(w),
        ).alias("gram"),
    ).where(F.col("gram").isNotNull())
    roll = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    fps = grams.select(
        "doc_id",
        "pos",
        "n_grams",
        F.min(
            F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("bigint")
        )
        .over(roll)
        .alias("fp"),
    ).where(F.col("pos") <= F.col("n_grams") - 4)  # full windows only (0-based pos)
    # count(DISTINCT) folds the dedup into the one per-doc aggregate —
    # min/max over all picks equal min/max over distinct picks
    return fps.groupBy("doc_id").agg(
        F.countDistinct("fp").alias("n_fingerprints"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
    )


WINNOWING_ORACLE = r"""
WITH d AS (
  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS c
  FROM documents
), sized AS (
  SELECT doc_id, c, length(c) AS n FROM d WHERE length(c) >= 9
), grams AS (
  SELECT doc_id, CAST(p AS BIGINT) AS pos,
         ('0x' || substring(md5(substring(c, CAST(p AS INTEGER), 5)), 1, 15))::BIGINT AS h,
         n - 4 AS n_grams
  FROM (SELECT doc_id, c, n, unnest(range(1, n - 3)) AS p FROM sized)
), rolled AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         pos, n_grams
  FROM grams
), fps AS (
  SELECT DISTINCT doc_id, fp FROM rolled WHERE pos <= n_grams - 3
)
SELECT doc_id, count(*) AS n_fingerprints, min(fp) AS min_fp, max(fp) AS max_fp
FROM fps GROUP BY doc_id
"""


# --------------------------------------------- SemDeDup semantic dedup

# mean cell size the codebook targets: k = ceil(n / TARGET) keeps the
# within-cell pair search Σ|cell|² ≈ n·TARGET (linear in corpus size)
_SEMDEDUP_TARGET_CELL = 32


def semantic_dedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public): k-means cells bound the
    quadratic cosine search, then near-identical embeddings WITHIN a cell
    are dropped keeping the lowest vec_id. The dense-embedding semantic
    dedup step that removes paraphrase duplicates exact/MinHash text
    dedup can't see.

    Plan/scale: the cell assignment is a broadcast-centroid argmin (the
    corpus never shuffles for it); the pair search self-joins ON the cell
    id, so candidate volume is Σ|cell|² — the whole point of SemDeDup is
    that cells stay small relative to the corpus. The cell count is
    DATA-DEPENDENT: k = ceil(n / TARGET_CELL), so mean cell size is held
    at ~TARGET_CELL and Σ|cell|² ≈ n·TARGET_CELL grows LINEARLY with the
    corpus (k=8 fixed would make it n²/8 — the quadratic scale-killer).
    The codebook is the IVF pattern from similarity.ivf_topk: a
    deterministic hash-ordered top-k sample (TakeOrderedAndProject —
    partial top-k per partition, no global sort); n itself is one count()
    action, the only scalar state. One shuffle on cell id, one anti-join
    to flag keeps. tests/test_wave_semantic_scale.py guards that k tracks
    n and the max-cell fraction shrinks as the corpus grows.

    Exactness: cosine through the shared HOF fold (bit-exact vs DuckDB
    list_cosine_similarity, proven by embedding_near_dup_exact_small);
    the drop threshold compares the ROUNDED similarity so the boundary is
    engine-stable; the codebook sample orders by md5(vec_id) — identical
    in both engines.
    """
    import math

    from nbi_oedi_etl_spark.operators import similarity

    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    k = max(1, math.ceil(n / _SEMDEDUP_TARGET_CELL))
    cents = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(k)
        .withColumnRenamed("vec_id", "centroid_id")
    )
    assign = similarity.kmeans_assignment_step(emb, cents).select(
        "vec_id", F.col("centroid_id").alias("cell_id")
    )
    # r14 (guide §2.3): each side's norm folds once per ROW before the
    # cell self-join instead of once per within-cell pair (Σ|cell|² of
    # them); _cosine_prenormed divides the same dot by the same `_norm`
    # doubles, so the rounded similarity is bit-identical.
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).join(assign, "vec_id").withColumn("_n", similarity._norm(F.col("emb")))
    a = vecs.select(
        F.col("vec_id").alias("vec_a"), F.col("emb").alias("ea"),
        F.col("_n").alias("_na"), "cell_id"
    )
    b = vecs.select(
        F.col("vec_id").alias("vec_b"), F.col("emb").alias("eb"),
        F.col("_n").alias("_nb"), "cell_id"
    )
    dup_pairs = (
        a.join(b, "cell_id")
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(
            F.round(
                similarity._cosine_prenormed(
                    F.col("ea"), F.col("eb"), F.col("_na"), F.col("_nb")
                ),
                6,
            )
            >= 0.3
        )
    )
    dropped = dup_pairs.select(F.col("vec_b").alias("vec_id")).distinct()
    return assign.join(dropped.withColumn("_drop", F.lit(1)), "vec_id", "left").select(
        "vec_id", "cell_id", F.col("_drop").isNull().alias("keep")
    )


SEMANTIC_DEDUP_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), ranked AS (
  SELECT vec_id, emb,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn,
         count(*) OVER () AS n
  FROM e
), c AS (
  SELECT vec_id AS centroid_id, emb AS c_emb FROM ranked
  WHERE rn <= CAST(ceil(n / 32.0) AS BIGINT)
), assign AS (
  SELECT vec_id, centroid_id AS cell_id
  FROM (
    SELECT e.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_distance(e.emb, c.c_emb), c.centroid_id) AS rn
    FROM e CROSS JOIN c
  ) WHERE rn = 1
), v AS (
  SELECT a.vec_id, a.cell_id, e.emb FROM assign a JOIN e USING (vec_id)
), dropped AS (
  SELECT DISTINCT b.vec_id
  FROM v a JOIN v b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= 0.3
)
SELECT a.vec_id, a.cell_id, (d.vec_id IS NULL) AS keep
FROM assign a LEFT JOIN dropped d ON a.vec_id = d.vec_id
"""


# ------------------------------------------------ token PMI bigrams


def token_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over ADJACENT token bigrams: the
    collocation / multi-word-expression miner (complements
    bpe_merge_candidates, which ranks merges by raw pair frequency — PMI
    surfaces pairs that co-occur far above chance regardless of volume).

    PMI(x,y) = ln( p(x,y) / (p(x)·p(y)) ) with all probabilities over the
    token count T:  ln c_xy + ln T − ln c_x − ln c_y.

    Exactness: each ln(count) is rounded once to 9 decimals into
    DECIMAL(18,9); the four-term combination is exact decimal addition;
    the surfaced pmi is the final round(…, 6) of that exact sum — no
    float accumulation anywhere.

    Plan/scale: bigrams come from ONE window lead over (doc_id, pos) —
    the same single-exchange posture as char_bigram_lm_score; unigram and
    bigram counts are plain aggregates; the unigram side is |vocab| rows,
    broadcast back onto the bigram counts.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: t != "")
        ).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = toks.select(
        F.col("tok").alias("tok_a"), F.lead("tok", 1).over(w).alias("tok_b")
    ).where(F.col("tok_b").isNotNull())
    bg = bigrams.groupBy("tok_a", "tok_b").agg(F.count(F.lit(1)).alias("c_xy"))
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    t_total = toks.count()  # one scalar; at scale a cached one-row agg

    def ln9(col):
        return F.round(F.log(col.cast("double")), 9).cast("decimal(18,9)")

    ua = uni.select(F.col("tok").alias("tok_a"), ln9(F.col("c")).alias("ln_cx"))
    ub = uni.select(F.col("tok").alias("tok_b"), ln9(F.col("c")).alias("ln_cy"))
    # max(1): on an empty corpus no row survives, but the literal is
    # evaluated at plan-build time — ln(0) would raise driver-side
    ln_t = F.lit(round(__import__("math").log(max(t_total, 1)), 9)).cast(
        "decimal(18,9)"
    )
    return (
        bg.where(F.col("c_xy") >= 10)
        .join(F.broadcast(ua), "tok_a")
        .join(F.broadcast(ub), "tok_b")
        .select(
            "tok_a",
            "tok_b",
            "c_xy",
            F.round(
                (ln9(F.col("c_xy")) + ln_t - F.col("ln_cx") - F.col("ln_cy")).cast(
                    "double"
                ),
                6,
            ).alias("pmi"),
        )
    )


TOKEN_PMI_ORACLE = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     x -> x != '') AS toks
  FROM documents
), bg AS (
  SELECT toks[CAST(i AS INTEGER)] AS tok_a,
         toks[CAST(i AS INTEGER) + 1] AS tok_b,
         count(*) AS c_xy
  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM d)
  GROUP BY 1, 2
), uni AS (
  SELECT unnest(toks) AS tok FROM d
), uni_c AS (
  SELECT tok, count(*) AS c FROM uni GROUP BY tok
), t AS (
  SELECT count(*) AS total FROM uni
)
SELECT bg.tok_a, bg.tok_b, bg.c_xy,
       round(CAST(CAST(round(ln(CAST(bg.c_xy AS DOUBLE)), 9) AS DECIMAL(18,9))
                  + CAST(round(ln(CAST((SELECT total FROM t) AS DOUBLE)), 9) AS DECIMAL(18,9))
                  - CAST(round(ln(CAST(ua.c AS DOUBLE)), 9) AS DECIMAL(18,9))
                  - CAST(round(ln(CAST(ub.c AS DOUBLE)), 9) AS DECIMAL(18,9))
             AS DOUBLE), 6) AS pmi
FROM bg
JOIN uni_c ua ON ua.tok = bg.tok_a
JOIN uni_c ub ON ub.tok = bg.tok_b
WHERE bg.c_xy >= 10
"""


# --------------------------------------- per-source language KL drift


def source_lang_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's language distribution against the
    corpus marginal — the dataset-mixture drift audit (is one ingest
    source skewing the language mix?). KL(P_s ‖ P) with P_s = langs
    within the source, P = corpus-wide.

    Exactness: KL = (1/n_s) Σ_l c_sl · (ln c_sl − ln n_s − ln c_l + ln N)
    — each ln(count) rounds once to 9 decimals, the bracket is exact
    decimal addition, the Σ multiplies by the integer count c_sl in exact
    decimal, and only the final (1/n_s) divide runs in doubles before
    round(6). Counts-only input → no float accumulation.

    Plan/scale: two tiny aggregates over (source, lang) — the grouped
    count is the only corpus shuffle; every join after it is over
    |sources|·|langs| rows.
    """
    docs = read_table(spark, sf_dir, "documents")
    sl = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c_sl"))
    s = sl.groupBy("source").agg(F.sum("c_sl").alias("n_s"))
    l = sl.groupBy("lang").agg(F.sum("c_sl").alias("c_l"))
    n_total = docs.count()

    def ln9(col):
        return F.round(F.log(col.cast("double")), 9).cast("decimal(18,9)")

    # max(1): plan-build-time literal; ln(0) would raise on empty input
    ln_n = F.lit(round(__import__("math").log(max(n_total, 1)), 9)).cast(
        "decimal(18,9)"
    )
    terms = (
        sl.join(F.broadcast(s), "source")
        .join(F.broadcast(l), "lang")
        .select(
            "source",
            "n_s",
            (
                F.col("c_sl").cast("decimal(10,0)")
                * (ln9(F.col("c_sl")) - ln9(F.col("n_s")) - ln9(F.col("c_l")) + ln_n)
            ).alias("term"),
        )
    )
    return terms.groupBy("source", "n_s").agg(
        F.round(F.sum("term").cast("double") / F.col("n_s"), 6).alias("kl_divergence")
    ).select("source", F.col("n_s").alias("n_docs"), "kl_divergence")


SOURCE_KL_ORACLE = """
WITH sl AS (
  SELECT source, lang, count(*) AS c_sl FROM documents GROUP BY source, lang
), s AS (
  SELECT source, sum(c_sl) AS n_s FROM sl GROUP BY source
), l AS (
  SELECT lang, sum(c_sl) AS c_l FROM sl GROUP BY lang
), n AS (
  SELECT count(*) AS total FROM documents
), terms AS (
  SELECT sl.source, s.n_s,
         CAST(sl.c_sl AS DECIMAL(10,0))
         * (CAST(round(ln(CAST(sl.c_sl AS DOUBLE)), 9) AS DECIMAL(18,9))
            - CAST(round(ln(CAST(s.n_s AS DOUBLE)), 9) AS DECIMAL(18,9))
            - CAST(round(ln(CAST(l.c_l AS DOUBLE)), 9) AS DECIMAL(18,9))
            + CAST(round(ln(CAST((SELECT total FROM n) AS DOUBLE)), 9) AS DECIMAL(18,9))
           ) AS term
  FROM sl JOIN s USING (source) JOIN l USING (lang)
)
SELECT source, CAST(n_s AS BIGINT) AS n_docs,
       round(CAST(sum(term) AS DOUBLE) / n_s, 6) AS kl_divergence
FROM terms GROUP BY source, n_s
"""


# ------------------------------------------ k-fold split assignment


def kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment (md5(doc_id) mod
    5 — same engine-portable hash bridge as hash_sample_documents) with
    the stratification-balance audit: docs and char volume per
    (fold, source). The split is reproducible on any engine, any run,
    any partitioning — the property TABLESAMPLE/rand() can't give.

    Plan/scale: map-only fold tag + one grouped aggregate; no shuffle
    beyond the (fold, source) groupBy.
    """
    d = read_table(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 5
    )
    return (
        d.select(fold.alias("fold"), "source", "n_chars")
        .groupBy("fold", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


KFOLD_ORACLE = """
SELECT ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 5 AS fold,
       source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
"""


# ----------------------------------- dup-cluster size distribution


def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution over the portable near-dup
    components — the dedup MONITORING rollup (a pipeline operator reads
    it to decide whether the biggest duplicate families warrant manual
    rules). Reuses the memoized pair-generation + closure stages shared
    with near_dup_clusters_portable / near_dup_keep_best, so in a bench
    or driver session the closure loop runs once across all four
    consumers.

    Plan/scale: two cheap aggregates over the (node, component) table —
    nothing touches the corpus again.
    """
    from nbi_oedi_etl_spark.workload_ext import portable_components

    comp = portable_components(spark, sf_dir)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        sizes.where(F.col("cluster_size") > 1)
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
    )


DUP_SIZE_HISTOGRAM_ORACLE = r"""
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
  SELECT u, v FROM e
  UNION
  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
), comps AS (
  SELECT u AS node, least(u, min(v)) AS component FROM reach GROUP BY u
), sizes AS (
  SELECT component, count(*) AS cluster_size FROM comps GROUP BY component
)
SELECT cluster_size, count(*) AS n_clusters
FROM sizes WHERE cluster_size > 1 GROUP BY cluster_size
"""
