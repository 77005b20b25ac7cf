"""Round-4 extension queries, wave 2: corpus curation, iterative graph
analytics, and warehouse-maintenance operators.

Families covered (all oracle-backed, same convention as workload.py —
every computed column aliased identically on the Spark and DuckDB side):

- ``doc_boilerplate_ngrams``  — corpus-frequent 5-gram boilerplate
  detection (RefinedWeb-style frequent-line removal, re-expressed over
  token 5-grams because the synthetic corpus is single-line).
- ``reservoir_sample_per_source`` — deterministic bottom-k-by-hash
  reservoir sample per stratum (fixed COUNT per group, complementing the
  fixed-FRACTION stratified sampler).
- ``char_bigram_lm_score`` — character-bigram language-model scoring
  (perplexity-proxy quality signal, KenLM-style but order-1).
- ``nation_trade_pagerank`` — damped PageRank, 3 unrolled iterations,
  over the revenue-weighted nation→nation trade graph.
- ``scd1_merge_orders`` — MERGE/upsert (SCD type 1) via full-outer join
  + coalesce: updates override, inserts append.
- ``event_funnel_conversion`` — ordered view→click→purchase funnel with
  strict timestamp progression per user.
- ``weekly_retention_cohorts`` — classic cohort/retention matrix on
  first-activity week.
- ``doc_containment_pairs`` — asymmetric containment (|A∩B|/|A|) on
  LSH candidate pairs: catches partial-copy duplicates Jaccard misses.
- ``zipf_slope_tokens`` — least-squares fit of ln(freq) vs ln(rank)
  over the top-100 tokens (Zipf exponent; corpus-health diagnostic).

Cross-engine exactness: integer/decimal arithmetic is exact by
construction; double expressions are written with IDENTICAL operation
order on both engines and rounded before any reduction whose order Spark
does not guarantee (round→cast DECIMAL→sum, the repo-wide convention).

Scale posture (SCALE.md): boilerplate/zipf/bigram model stages shuffle
once on the exploded key and reduce map-side; the frequent-/model-side
joins back to the corpus are small-table joins (the bigram model is
bounded by alphabet², the top-k list by k) — structurally bounded sides
are broadcast, data-dependent sides (frequent 5-grams) are left to AQE.
PageRank aggregates the fact table to a ≤|nations|² edge list FIRST and
iterates on the aggregate, so the iteration cost is independent of fact
cardinality. The merge is one full-outer shuffle on the natural key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table


# ------------------------------------------------ boilerplate 5-grams

_BOILER_MIN_DOCS = 10  # 5-gram present in >= this many distinct docs


def doc_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequent 5-gram detection: the batch re-expression of
    RefinedWeb/CCNet frequent-line boilerplate removal (public recipe)
    for a corpus whose documents are single-line.

    A 5-gram is boilerplate when it appears in >= 10 distinct documents;
    each doc reports its distinct-5-gram count, how many of those are
    boilerplate, and the ratio (a quality-filter signal).

    Plan: one window shuffle on doc_id builds 5-grams via lead() (codegen,
    no interpreted HOFs in the corpus-wide path — same posture as
    _portable_minhash_pairs), one shuffle on the 5-gram computes document
    frequency, and the frequent set joins back WITHOUT a forced broadcast
    (its size is data-dependent; AQE decides — the near_dup_keep_best
    lesson)."""
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower("text")), r"\s+")).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    t = t.select(
        "doc_id",
        "tok",
        *[F.lead("tok", i).over(w).alias(f"t{i}") for i in range(1, 5)],
    )
    sh = (
        t.where(F.col("t4").isNotNull())
        .select("doc_id", F.concat_ws(" ", "tok", "t1", "t2", "t3", "t4").alias("s"))
        .distinct()
    )
    freq = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= _BOILER_MIN_DOCS)
        .select("s", F.lit(1).alias("_boiler"))
    )
    per_doc = (
        sh.join(freq, "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce("_boiler", F.lit(0))).alias("n_boiler"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_boiler",
        F.round(F.col("n_boiler") * F.lit(1.0) / F.col("n_shingles"), 6).alias(
            "boiler_ratio"
        ),
    )


BOILERPLATE_ORACLE = r"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(len(toks) - 4),
             i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                  || ' ' || toks[i+4] || ' ' || toks[i+5])) AS s
  FROM d
), freq AS (
  SELECT s FROM sh GROUP BY s HAVING count(*) >= 10
)
SELECT sh.doc_id,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN f.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       round(sum(CASE WHEN f.s IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS boiler_ratio
FROM sh LEFT JOIN freq f ON sh.s = f.s
GROUP BY sh.doc_id
"""


# ------------------------------------- deterministic reservoir sample

_RESERVOIR_K = 5


def reservoir_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-SIZE sample per stratum: bottom-k by md5 rank
    within each source (k=5). The hash order is a uniform permutation, so
    this is an exact, re-runnable reservoir sample — the fixed-count
    complement of the fixed-fraction ``stratified_sample_documents``.

    Plan: ONE window shuffle on source; WindowGroupLimit pushes the k=5
    cutoff below the sort so each partition keeps only its top-k
    candidates before the exchange."""
    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("source", "doc_id", "n_chars", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= _RESERVOIR_K)
    )


RESERVOIR_ORACLE = r"""
SELECT source, doc_id, n_chars, rk FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
) WHERE rk <= 5
"""


# ---------------------------------------- char-bigram LM quality score

def char_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram language-model scoring: train an order-1 char LM
    on the corpus itself (counts over [a-z ] bigrams), then score each
    document by its mean log-probability — the classic perplexity-proxy
    quality signal (CCNet/KenLM recipe, public; here order-1 so the model
    is exactly buildable in one aggregate).

    Exactness: ln(count/total) is rounded to 9 places in the MODEL (once
    per bigram, identical formula both engines), and the per-doc
    reduction sums DECIMAL(18,9) — order-independent — before the final
    divide/round(6).

    Plan: chars explode to (doc_id, pos, ch) rows — NEVER carrying the
    full document string per exploded row (the first formulation
    projected `c` beside every position index: O(doc_len²) bytes per doc,
    6.8 s at sf0.1; this one is 1-char rows + a window lead, the
    _portable_minhash_pairs posture). The doc_id window shuffle is the
    ONE wide exchange: the (doc_id, bg) count aggregate and the final
    per-doc score aggregate both group on supersets/equals of doc_id, so
    they reuse its partitioning; the model aggregate shuffles only
    per-doc-distinct bigram counts (≤ alphabet² per doc) and broadcasts
    back (bounded ≤ 729 rows). Scoring multiplies the decimal lnp by the
    per-doc count — exact — instead of re-joining raw occurrences.

    r14 note: the array-adjacency alternative (bigrams via per-row
    transform over the char array / substring indices, no window) was
    A/B-measured at sf0.1 and came out ~1.7× SLOWER than this shape
    (3.0–3.7 s vs 1.7–2.2 s for the bg_counts stage) — the window's
    doc-keyed exchange of 1-char rows is cheaper here than the per-row
    construction of an L-element two-char-string array. Kept as-is;
    the opposite trade held for ccnet's WORD bigrams at 10×."""
    docs = read_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.regexp_replace(F.lower("text"), "[^a-z ]", "").alias("c"),
    ).where(F.length("c") >= 2)
    # the zero-width split leaves one trailing "" element — drop it, or
    # every doc gains a phantom (last-char + "") bigram
    chars = d.select(
        "doc_id", F.posexplode(F.split("c", "(?!^)")).alias("pos", "ch")
    ).where(F.col("ch") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg_counts = (
        chars.select(
            "doc_id", F.concat("ch", F.lead("ch", 1).over(w)).alias("bg")
        )
        .where(F.col("bg").isNotNull())
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    model = bg_counts.groupBy("bg").agg(F.sum("n").alias("cnt"))
    total = model.agg(F.sum("cnt").alias("total"))
    model = model.crossJoin(F.broadcast(total)).select(
        "bg",
        F.round(F.log(F.col("cnt") * F.lit(1.0) / F.col("total")), 9).alias("lnp"),
    )
    scored = (
        bg_counts.join(F.broadcast(model), "bg")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_bigrams"),
            # n is cast to decimal(10,0) so the product type is (29,9) —
            # EXACT; a raw bigint operand promotes to (39,9) which Spark
            # truncates to (38,8) under allowPrecisionLoss, silently
            # rounding each product and breaking oracle parity
            F.sum(
                F.col("lnp").cast("decimal(18,9)") * F.col("n").cast("decimal(10,0)")
            ).alias("_s"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        F.round(F.col("_s").cast("double") / F.col("n_bigrams"), 6).alias("avg_logp"),
    )


CHAR_BIGRAM_LM_ORACLE = r"""
WITH d AS (
  SELECT doc_id, regexp_replace(lower(text), '[^a-z ]', '', 'g') AS c
  FROM documents
), d2 AS (
  SELECT doc_id, c FROM d WHERE length(c) >= 2
), bg AS (
  SELECT doc_id, substr(c, CAST(i AS INTEGER), 2) AS bg
  FROM (SELECT doc_id, c, unnest(range(1, length(c))) AS i FROM d2)
), model AS (
  SELECT bg, count(*) AS cnt FROM bg GROUP BY bg
), tot AS (
  SELECT sum(cnt) AS total FROM model
), lnmodel AS (
  SELECT bg, round(ln(cnt * 1.0 / total), 9) AS lnp FROM model, tot
)
SELECT b.doc_id,
       count(*) AS n_bigrams,
       round(CAST(sum(CAST(m.lnp AS DECIMAL(18,9))) AS DOUBLE)
             / count(*), 6) AS avg_logp
FROM bg b JOIN lnmodel m ON b.bg = m.bg
GROUP BY b.doc_id
"""


# --------------------------------------------- PageRank on trade graph

_PR_DAMP = 0.85
_PR_ITERS = 3


def nation_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (d=0.85, 3 iterations, uniform init, no dangling
    redistribution — the simplified variant of Page et al. 1999) over the
    revenue-weighted trade graph supplier-nation → customer-nation.

    The iterative-graph pattern beyond connected components: edge weights
    aggregate the FACT table down to a <=|nations|² edge list first, so
    each of the 3 iterations runs on the aggregate (25-node graph), not
    the fact table — at 100 TB the iteration cost is O(|graph|), with the
    single fact shuffle paid once and the edge list cached across rounds.

    Exactness: edge weights are exact decimal revenue sums; the out-link
    fraction is the ONLY double expression (one deterministic division,
    rounded to 12 places into DECIMAL(14,12)); from there every rank
    update — multiply, sum, damp, add — is pure decimal arithmetic, so
    the iteration is bit-exact cross-engine and order-independent. The
    output is fixed-point: pagerank_e12 = rank × 10^12 as BIGINT (double
    round-half behavior differs between engines on the short-decimal
    values PageRank produces, so the query never rounds a double)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")

    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("src")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("dst")
    )
    # only the nation role-aliases are FORCE-broadcast (structurally
    # bounded, 25 rows); customer/supplier are O(scale factor) — the hint
    # is left to AQE's size statistics, per the module posture
    edges = (
        li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust.select("c_custkey", "c_nationkey"),
              orders["o_custkey"] == F.col("c_custkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .groupBy("src", "dst")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
                .cast("decimal(18,4)")
            ).alias("w_dec")
        )
    )
    out_w = edges.groupBy("src").agg(F.sum("w_dec").alias("out_dec"))
    frac = (
        edges.join(out_w, "src")
        .select(
            "src",
            "dst",
            F.round(
                F.col("w_dec").cast("double") / F.col("out_dec").cast("double"), 12
            )
            .cast("decimal(14,12)")
            .alias("frac"),
        )
        .cache()
    )
    nodes = nation.select(F.col("n_name").alias("nation"))
    base = F.lit("0.006").cast("decimal(5,3)")  # (1-d)/N = 0.15/25
    damp = F.lit("0.85").cast("decimal(3,2)")
    zero = F.lit("0").cast("decimal(20,12)")
    ranks = nodes.select(
        "nation", F.lit("0.04").cast("decimal(16,12)").alias("r")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            frac.join(ranks, frac["src"] == ranks["nation"])
            .select("dst", (F.col("r") * F.col("frac")).alias("c"))
            .groupBy("dst")
            .agg(F.round(F.sum("c"), 12).cast("decimal(20,12)").alias("s12"))
        )
        ranks = (
            nodes.join(contrib, nodes["nation"] == contrib["dst"], "left")
            .select(
                "nation",
                F.round(base + damp * F.coalesce(F.col("s12"), zero), 12)
                .cast("decimal(16,12)")
                .alias("r"),
            )
        )
    return ranks.select(
        "nation",
        (F.col("r") * F.lit(1_000_000_000_000)).cast("bigint").alias("pagerank_e12"),
    )


_PR_ITER_SQL = """
  SELECT n.nation,
         CAST(round(CAST(0.006 AS DECIMAL(5,3))
               + CAST(0.85 AS DECIMAL(3,2))
                 * coalesce(CAST(round(sum(p.r * f.frac), 12) AS DECIMAL(20,12)),
                            CAST(0 AS DECIMAL(20,12))), 12)
           AS DECIMAL(16,12)) AS r
  FROM nodes n
  LEFT JOIN frac f ON f.dst = n.nation
  LEFT JOIN {prev} p ON p.nation = f.src
  GROUP BY n.nation
"""

PAGERANK_ORACLE = (
    r"""
WITH edges AS (
  SELECT sn.n_name AS src, cn.n_name AS dst,
         sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS w_dec
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  GROUP BY sn.n_name, cn.n_name
), out_w AS (
  SELECT src, sum(w_dec) AS out_dec FROM edges GROUP BY src
), frac AS (
  SELECT e.src, e.dst,
         CAST(round(CAST(e.w_dec AS DOUBLE) / CAST(o.out_dec AS DOUBLE), 12)
              AS DECIMAL(14,12)) AS frac
  FROM edges e JOIN out_w o ON e.src = o.src
), nodes AS (
  SELECT n_name AS nation FROM nation
), it0 AS (
  SELECT nation, CAST(0.04 AS DECIMAL(16,12)) AS r FROM nodes
), it1 AS ("""
    + _PR_ITER_SQL.format(prev="it0")
    + """), it2 AS ("""
    + _PR_ITER_SQL.format(prev="it1")
    + """), it3 AS ("""
    + _PR_ITER_SQL.format(prev="it2")
    + """)
SELECT nation, CAST(r * 1000000000000 AS BIGINT) AS pagerank_e12 FROM it3
"""
)


# -------------------------------------------------- SCD1 merge/upsert

def scd1_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (SCD type 1) as a DataFrame plan: a change
    batch (updates: every orderkey % 100 == 0 gets status 'U' and a 5%
    price raise; inserts: orderkey % 97 == 3 cloned under key+50M with
    status 'N') applied to the base via FULL OUTER join + coalesce —
    matched rows take the change, unmatched-change rows insert, the rest
    pass through. The batch twin of the reference's overwrite-partition
    maintenance path (etl/oedi_etl/etl.py upload flow).

    Exactness: prices are DECIMAL(18,2) end-to-end (the 1.05 raise is an
    exact decimal multiply); the final column is cast to DOUBLE (exact
    for 2-decimal values).

    Plan: ONE full-outer shuffle on the natural key; the change batch is
    derived, not re-read. At scale the same plan serves CDC upserts where
    the change batch arrives from a stream."""
    orders = read_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    upd = base.where(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        F.round(F.col("price") * F.lit("1.05").cast("decimal(4,2)"), 2)
        .cast("decimal(18,2)")
        .alias("price"),
    )
    ins = base.where(F.col("o_orderkey") % 97 == 3).select(
        (F.col("o_orderkey") + F.lit(50_000_000)).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "price",
    )
    changes = upd.unionByName(ins)
    b, c = base.alias("b"), changes.alias("c")
    merged = b.join(c, F.col("b.o_orderkey") == F.col("c.o_orderkey"), "full_outer")
    return merged.select(
        F.coalesce(F.col("c.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
        F.coalesce(F.col("c.o_custkey"), F.col("b.o_custkey")).alias("o_custkey"),
        F.coalesce(F.col("c.o_orderstatus"), F.col("b.o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.coalesce(F.col("c.price"), F.col("b.price"))
        .cast("double")
        .alias("price_final"),
    )


SCD1_MERGE_ORACLE = r"""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
), upd AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         CAST(round(price * CAST(1.05 AS DECIMAL(4,2)), 2)
              AS DECIMAL(18,2)) AS price
  FROM base WHERE o_orderkey % 100 = 0
), ins AS (
  SELECT o_orderkey + 50000000 AS o_orderkey, o_custkey,
         'N' AS o_orderstatus, price
  FROM base WHERE o_orderkey % 97 = 3
), changes AS (
  SELECT * FROM upd UNION ALL SELECT * FROM ins
)
SELECT coalesce(c.o_orderkey, b.o_orderkey) AS o_orderkey,
       coalesce(c.o_custkey, b.o_custkey) AS o_custkey,
       coalesce(c.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
       CAST(coalesce(c.price, b.price) AS DOUBLE) AS price_final
FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
"""


# ------------------------------------------------- funnel conversion

def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: view → click (strictly after the user's first
    view) → purchase (strictly after that first qualifying click). One
    summary row with stage counts and conversion rates — the product-
    analytics staple over the events stream.

    Plan: three conditional min-aggregates, each a hash aggregate on
    user_id reusing the same partitioning (Exchange reuse); the stage
    joins are on the already-aggregated per-user tables (|users| rows,
    not |events|)."""
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    totals = ev.agg(F.countDistinct("user_id").alias("n_users"))
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click_after_view"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase_after_click"))
    row = totals.crossJoin(nv).crossJoin(nc).crossJoin(np_)
    return row.select(
        "n_users",
        "n_view",
        "n_click_after_view",
        "n_purchase_after_click",
        # try_divide: NULL (not an ANSI error) on an empty event stream;
        # identical to `/` whenever the funnel has any users
        F.round(
            F.try_divide(F.col("n_view") * F.lit(1.0), F.col("n_users")), 6
        ).alias("view_rate"),
        F.round(
            F.try_divide(
                F.col("n_purchase_after_click") * F.lit(1.0), F.col("n_view")
            ),
            6,
        ).alias("funnel_rate"),
    )


FUNNEL_ORACLE = r"""
WITH ev AS (
  SELECT user_id, event_type, ts FROM events
), v AS (
  SELECT user_id, min(ts) AS t_view FROM ev
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM ev e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM ev e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT count(DISTINCT user_id) FROM ev) AS n_users,
       (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_click_after_view,
       (SELECT count(*) FROM p) AS n_purchase_after_click,
       round((SELECT count(*) FROM v) * 1.0
             / (SELECT count(DISTINCT user_id) FROM ev), 6) AS view_rate,
       round((SELECT count(*) FROM p) * 1.0
             / (SELECT count(*) FROM v), 6) AS funnel_rate
"""


# -------------------------------------------- weekly retention cohorts

def weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by the ISO week of their
    first event; each (cohort_week, activity_week) cell counts distinct
    users from that cohort active that week.

    Plan: first-event week is one aggregate on user_id; the activity set
    is a distinct on (user_id, week) — both shuffle on user_id, so the
    join between them reuses the exchange; the final cell aggregate
    shuffles on the (small) week-pair key."""
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("activity_week")
    ).distinct()
    return (
        activity.join(first, "user_id")
        .groupBy("cohort_week", "activity_week")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


RETENTION_ORACLE = r"""
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS activity_week
  FROM events
)
SELECT f.cohort_week, a.activity_week, count(DISTINCT a.user_id) AS n_users
FROM activity a JOIN first f ON a.user_id = f.user_id
GROUP BY f.cohort_week, a.activity_week
"""


# ---------------------------------------------- containment dedup pairs

def doc_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment scoring on LSH candidate pairs:
    containment(A→B) = |A∩B| / |A| over distinct 3-gram shingle sets.
    Catches partial-copy duplication (a short doc embedded in a long one)
    that symmetric Jaccard under-scores — the standard complement in
    corpus dedup (Broder 1997's containment, public).

    Plan: candidates come from the oracle-proven portable MinHash banding
    (never all-pairs); the pair table is cached (bounded candidate set)
    and its doc ids semi-join the corpus, so the interpreted-HOF shingle
    arrays are built only for candidate docs; set arithmetic runs via
    array built-ins."""
    from nbi_oedi_etl_spark.operators.dedup import shingles
    from nbi_oedi_etl_spark.workload_ext import (
        _portable_minhash_pairs,
        portable_signatures_cached,
    )

    docs = read_table(spark, sf_dir, "documents")
    pairs = _portable_minhash_pairs(
        docs, sig=portable_signatures_cached(spark, sf_dir)
    ).cache()
    ids = (
        pairs.select(F.col("doc_id_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_id_b").alias("doc_id")))
        .distinct()
    )
    sh = docs.join(ids, "doc_id", "left_semi").select(
        "doc_id", shingles(F.col("text"), 3).alias("sh")
    )
    out = (
        pairs.join(sh.withColumnsRenamed({"doc_id": "doc_id_a", "sh": "sh_a"}), "doc_id_a")
        .join(sh.withColumnsRenamed({"doc_id": "doc_id_b", "sh": "sh_b"}), "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("n_inter"),
            F.size("sh_a").alias("n_a"),
            F.size("sh_b").alias("n_b"),
        )
    )
    return out.select(
        "doc_id_a",
        "doc_id_b",
        "n_inter",
        F.round(
            F.col("n_inter") * F.lit(1.0)
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
            6,
        ).alias("jaccard"),
        F.round(F.col("n_inter") * F.lit(1.0) / F.col("n_a"), 6).alias("cont_a_in_b"),
        F.round(F.col("n_inter") * F.lit(1.0) / F.col("n_b"), 6).alias("cont_b_in_a"),
    )


CONTAINMENT_ORACLE = r"""
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
)
SELECT i.doc_id_a, i.doc_id_b, i.n_inter,
       round(i.n_inter * 1.0 / (na.n + nb.n - i.n_inter), 6) AS jaccard,
       round(i.n_inter * 1.0 / na.n, 6) AS cont_a_in_b,
       round(i.n_inter * 1.0 / nb.n, 6) AS cont_b_in_a
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_id_a
JOIN sizes nb ON nb.doc_id = i.doc_id_b
"""


# --------------------------------------------------- Zipf slope fit

_ZIPF_TOPK = 100


def zipf_slope_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares fit of ln(freq) against ln(rank) over the top-100
    tokens: the Zipf exponent, a one-number corpus-health diagnostic
    (natural corpora sit near slope -1; synthetic/templated ones drift).

    Exactness: x=ln(rank) and y=ln(freq) are rounded to 9 places; the
    five regression sums reduce DECIMAL-cast products, so the closed-form
    slope/intercept are order-independent.

    Plan: token counts are one exploded-key shuffle; the top-100 cut is a
    single global sort-limit on the (already tiny) vocabulary table; the
    regression is one aggregate over 100 rows."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    top = (
        counts.select("tok", "cnt", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= _ZIPF_TOPK)
    )
    xy = top.select(
        F.round(F.log(F.col("rank") * F.lit(1.0)), 9).alias("x"),
        F.round(F.log(F.col("cnt") * F.lit(1.0)), 9).alias("y"),
    )
    sums = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(28,9)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(28,9)")).alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 9).cast("decimal(28,9)")).alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 9).cast("decimal(28,9)")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return sums.select(
        "n",
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - F.round(slope, 6) * sx) / n, 6).alias("intercept"),
    )


ZIPF_ORACLE = r"""
WITH t AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
  FROM documents
), toks AS (
  SELECT tok FROM t WHERE tok <> ''
), counts AS (
  SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
), top AS (
  SELECT tok, cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rank
  FROM counts QUALIFY rank <= 100
), xy AS (
  SELECT round(ln(rank * 1.0), 9) AS x, round(ln(cnt * 1.0), 9) AS y FROM top
), sums AS (
  SELECT count(*) AS n,
         sum(CAST(x AS DECIMAL(28,9))) AS sx,
         sum(CAST(y AS DECIMAL(28,9))) AS sy,
         sum(CAST(round(x * y, 9) AS DECIMAL(28,9))) AS sxy,
         sum(CAST(round(x * x, 9) AS DECIMAL(28,9))) AS sxx
  FROM xy
)
SELECT n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope,
       round((CAST(sy AS DOUBLE)
              - round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS intercept
FROM sums
"""
