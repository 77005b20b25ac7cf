"""Round-4 extension queries, wave 5: stream-static enrichment, interval
algebra, graph cores, sketch set-operations, distributed linear algebra,
and lexical statistics.

- ``streaming_static_enrichment`` — the stream⋈static dimension join
  (stateless per micro-batch, broadcast static side): the one streaming
  join shape the suite didn't yet cover (stream-stream and streaming
  aggregation are banked).
- ``supplier_busy_intervals`` — overlapping-interval merge (classic
  gaps-and-islands with a running-max frame): per-supplier busy islands
  over [shipdate, receiptdate] ranges.
- ``copurchase_kcore`` — k-core decomposition (iterative peeling) of the
  part co-purchase graph: the degeneracy-based community primitive one
  level above connected components / PageRank / triangles.
- ``kmv_source_overlap`` — KMV (bottom-k / theta-style) sketch SET
  OPERATIONS: per-source distinct-token sketches combined pairwise into
  union/intersection/Jaccard estimates, with the exact Jaccard audited
  alongside. Completes the sketch family (CMS/HLL/Bloom/bottom-k
  quantiles) with the cross-sketch combine step.
- ``embedding_covariance`` — exact covariance/correlation matrix of the
  embedding table via distributed outer-product aggregation: the
  linear-algebra-on-DataFrames pattern (feature-drift / PCA input).
- ``doc_lexical_diversity`` — type-token ratio, hapax ratio, mean token
  length per document: the lexical-richness quality signals.

Oracle convention identical to workload.py (DuckDB twin per query; all
output columns scalar-typed; aggregates aliased identically both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table

# ------------------------------------ stream ⋈ static dimension join


def streaming_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases STREAM enriched with the static customer→nation dimension
    (SURVEY.md §2.9): the stream-static join — stateless, re-planned per
    micro-batch with the dimension broadcast, no watermark/state needed
    (unlike stream-stream joins). The standard shape for enriching a
    100 TB/day event feed with slowly-changing reference data: the fact
    side never shuffles, the dimension ships to executors once per batch.

    The availableNow drain over the full file equals the batch join, so a
    plain-SQL oracle value-checks it exactly (reference precedent: the
    metadata join of transform.py:57-88 done continuously)."""
    import tempfile

    from nbi_oedi_etl_spark.streaming import ingest

    s = ingest.scoped_streaming_session(spark)
    dim = (
        read_table(s, sf_dir, "customer")
        .join(
            F.broadcast(read_table(s, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("c_custkey"),
            F.col("c_name"),
            F.col("c_mktsegment"),
            F.col("n_name").alias("nation_name"),
        )
    )
    stream = (
        ingest.events_file_stream(s, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )
    enriched = stream.join(
        F.broadcast(dim), stream["user_id"] == dim["c_custkey"], "inner"
    ).select("event_id", "user_id", "c_name", "c_mktsegment", "nation_name", "value")
    q = ingest.run_available_now(
        enriched,
        tempfile.mkdtemp(),
        queue_name="stream_static_enrich",
        output_mode="append",
    )
    q.awaitTermination()
    return s.table("stream_static_enrich")


STATIC_ENRICHMENT_ORACLE = """
SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment,
       n.n_name AS nation_name, e.value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE e.event_type = 'purchase'
"""


# ------------------------------- overlapping-interval merge (islands)


def supplier_busy_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge each supplier's overlapping shipment intervals into maximal
    busy islands — the classic gaps-and-islands pattern with a
    RUNNING-MAX frame (an island break is a start strictly after the max
    end seen so far), distinct from gap-based sessionization
    (user_sessions) which only compares adjacent rows: variable-length
    intervals mean an earlier row can bridge a gap its immediate
    predecessor doesn't.

    Interval: [shipdate, shipdate + (quantity % 15) days] — the slimmed
    testdata lineitem has no receiptdate, so each line occupies a hold
    window scaled by its quantity (variable 0-14 day spans, which is
    what makes the running-max formulation load-bearing).

    Determinism: the window orders by (start, end, orderkey, linenumber)
    — a total order — so island numbering is identical in both engines.
    All arithmetic is integer day counts: exact.

    Plan/scale: ONE hash(suppkey) exchange; the island-id window, the
    per-island aggregate, and the per-supplier aggregate all partition on
    suppkey or supersets of it, so the sort/exchange is paid once. Skewed
    suppliers are bounded by order volume per key; AQE skew handling
    applies to the single exchange."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.to_date("l_shipdate").alias("s0"),
        F.date_add(
            F.to_date("l_shipdate"), F.col("l_quantity").cast("int") % 15
        ).alias("e0"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("l_suppkey").orderBy(
        "s0", "e0", "l_orderkey", "l_linenumber"
    )
    prev_max = F.max("e0").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = li.withColumn(
        "new_island",
        F.when(prev_max.isNull() | (F.col("s0") > prev_max), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = flagged.groupBy("l_suppkey", "island").agg(
        F.min("s0").alias("s"),
        F.max("e0").alias("e"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        islands.groupBy("l_suppkey")
        .agg(
            F.sum("n").alias("n_intervals"),
            F.count(F.lit(1)).alias("n_islands"),
            F.sum(F.datediff("e", "s") + 1).alias("covered_days"),
            F.max(F.datediff("e", "s") + 1).alias("longest_island_days"),
        )
        .select(
            "l_suppkey", "n_intervals", "n_islands", "covered_days",
            "longest_island_days",
        )
    )


BUSY_INTERVALS_ORACLE = """
WITH iv AS (
  SELECT l_suppkey,
         CAST(l_shipdate AS DATE) AS s0,
         CAST(l_shipdate AS DATE)
           + (CAST(l_quantity AS INTEGER) % 15) AS e0,
         l_orderkey, l_linenumber
  FROM lineitem
), flagged AS (
  SELECT l_suppkey, s0, e0,
         CASE WHEN max(e0) OVER (
                PARTITION BY l_suppkey
                ORDER BY s0, e0, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) IS NULL
           OR s0 > max(e0) OVER (
                PARTITION BY l_suppkey
                ORDER BY s0, e0, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              )
         THEN 1 ELSE 0 END AS new_island,
         l_orderkey, l_linenumber
  FROM iv
), numbered AS (
  SELECT l_suppkey, s0, e0,
         sum(new_island) OVER (
           PARTITION BY l_suppkey
           ORDER BY s0, e0, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS island
  FROM flagged
), islands AS (
  SELECT l_suppkey, island, min(s0) AS s, max(e0) AS e,
         count(*) AS n
  FROM numbered GROUP BY 1, 2
)
SELECT l_suppkey,
       CAST(sum(n) AS BIGINT) AS n_intervals,
       count(*) AS n_islands,
       CAST(sum(e - s + 1) AS BIGINT) AS covered_days,
       max(e - s + 1) AS longest_island_days
FROM islands GROUP BY 1
"""


# ------------------------------------------ k-core decomposition

_KCORE_K = 2
_KCORE_ROUNDS = 8


def copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=2) of the part co-purchase graph by
    iterative peeling: repeatedly drop nodes of degree < k until the
    remaining subgraph (the k-core) is stable — the degeneracy primitive
    above connected components (Seidman 1983, public). The oracle unrolls
    exactly 8 peel rounds; Spark runs AT MOST 8, exiting early once a
    round drops no edges. That exit is exactly result-preserving: each
    round's edge set is a SUBSET of the previous (semi-joins only filter),
    so an unchanged count proves an unchanged set, which is a fixed point
    — every remaining round would be a no-op job. tests/test_ext11.py
    asserts the peel has CONVERGED by round 8 at test scale, so the
    output is the true 2-core, not a truncation.

    Edge list: part pairs co-purchased in ≥ 2 distinct orders — the same
    support-thresholded graph as copurchase_triangles.

    Plan/scale: the fact table is touched ONCE (a single order-keyed
    group builds per-order part sets; pairs expand map-side — no
    self-join, no second fact shuffle); every peel round then runs on
    the edge list —
    two semi-joins against the surviving-node set + one degree aggregate
    — with ``localCheckpoint`` truncating the per-round lineage exactly
    like connected_components. At 100 TB the edge list after support
    thresholding is the graph's signal density, orders smaller than the
    fact table; peeling cost is O(|E|) per round × O(peel depth) rounds.

    Output: (part, deg) for every node in the k-core with its core
    degree."""
    # pair expansion WITHOUT a self-join: one shuffle groups the fact by
    # order into a sorted part set (collect_set dedups in the same pass,
    # retiring the former dropDuplicates shuffle), then the unique pairs
    # per order expand map-side via posexplode + slice — pa < pb by the
    # sort. Two shuffles total (order group, pair support) where the
    # self-join shape paid three and shuffled the fact twice; per-order
    # arrays are basket-sized, so the expansion is narrow at any scale.
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    edges = (
        baskets.select("parts", F.posexplode("parts").alias("i", "pa"))
        .select(
            "pa",
            F.explode(
                F.slice(F.col("parts"), F.col("i") + F.lit(2), F.size("parts"))
            ).alias("pb"),
        )
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("pa", "pb")
        # checkpoint, NOT cache: the peel plan references the edge list
        # three times per round; a cache() here leaves the build lineage
        # inside the peel plan, which disables AQE's runtime coalescing
        # for every downstream shuffle (measured 2x slower) — the
        # materialized checkpoint keeps each round's stages sized by AQE
        .localCheckpoint()
    )
    def peel_once(e: DataFrame) -> DataFrame:
        directed = e.select(F.col("pa").alias("node")).unionAll(
            e.select(F.col("pb").alias("node"))
        )
        alive = (
            directed.groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= _KCORE_K)
            .select("node")
        )
        return (
            e.join(alive.withColumnRenamed("node", "pa"), "pa", "left_semi")
            .join(alive.withColumnRenamed("node", "pb"), "pb", "left_semi")
            .select("pa", "pb")
        )

    # TWO peel iterations per checkpoint: the per-round data is tiny after
    # the first drop, so wall-clock is dominated by job count, not shuffle
    # volume — fusing halves the checkpoint jobs while the plan stays
    # small (edges referenced 3^2 times per macro-round, well under any
    # analysis limit). The convergence count rides the checkpoint job
    # itself via observe() — no separate count() scan per round (subset +
    # unchanged count = converged, and a fused pair of no-op rounds is
    # still a no-op).
    from pyspark.sql import Observation

    prev_edges = None
    for r in range(_KCORE_ROUNDS // 2):
        obs = Observation(f"kcore_round_{r}")
        edges = (
            peel_once(peel_once(edges))
            .observe(obs, F.count(F.lit(1)).alias("n_edges"))
            .localCheckpoint()
        )
        cur_edges = obs.get["n_edges"]
        if cur_edges == prev_edges:  # subset + same count = fixed point
            break
        prev_edges = cur_edges
    return (
        edges.select(F.col("pa").alias("part")).unionAll(
            edges.select(F.col("pb").alias("part"))
        )
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def _kcore_oracle(k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> str:
    """Unrolled peel: plain CTE chain (no recursion-reference limits), one
    (alive, edges) pair per round — the oracle mirrors the Spark loop
    round for round. Every CTE is MATERIALIZED: DuckDB inlines CTEs by
    default, and each round references the previous one three times, so
    inlining would expand the base scan 3^rounds times (observed as an
    fd-exhaustion blowup, not just slowness)."""
    parts = [
        "e0 AS MATERIALIZED (\n"
        "  SELECT a.l_partkey AS pa, b.l_partkey AS pb\n"
        "  FROM lineitem a\n"
        "  JOIN lineitem b ON a.l_orderkey = b.l_orderkey"
        " AND a.l_partkey < b.l_partkey\n"
        "  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2\n)"
    ]
    for r in range(rounds):
        parts.append(
            f"a{r + 1} AS MATERIALIZED (\n"
            f"  SELECT node FROM (SELECT pa AS node FROM e{r}"
            f" UNION ALL SELECT pb FROM e{r})\n"
            f"  GROUP BY node HAVING count(*) >= {k}\n)"
        )
        parts.append(
            f"e{r + 1} AS MATERIALIZED (\n"
            f"  SELECT pa, pb FROM e{r}\n"
            f"  WHERE pa IN (SELECT node FROM a{r + 1})"
            f" AND pb IN (SELECT node FROM a{r + 1})\n)"
        )
    final = (
        f"SELECT part, count(*) AS deg FROM\n"
        f"  (SELECT pa AS part FROM e{rounds}"
        f" UNION ALL SELECT pb FROM e{rounds})\n"
        f"GROUP BY part"
    )
    return "WITH " + ",\n".join(parts) + "\n" + final


KCORE_ORACLE = _kcore_oracle()


# ------------------------- KMV (bottom-k) sketch set operations

_KMV_K = 16


def kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / theta-style sketch SET OPERATIONS (Beyer et al. 2007, public):
    one bottom-16 sketch of distinct-token md5 hashes per document
    (k sized to the synthetic 31-token vocabulary so the theta-estimator
    branch is actually exercised; production k is 256-4096)
    source, then every source pair combined sketch-side into union-size,
    intersection-size and Jaccard ESTIMATES — with the exact Jaccard
    computed alongside as the accuracy audit. This is the step the other
    sketches don't cover: estimating relations BETWEEN sets from
    fixed-size summaries (the theta-sketch use case: overlap of crawl
    snapshots, contamination across corpus sources).

    Estimator: for pair (A, B), U = bottom-k of the merged hash sets,
    θ = max(U); ρ = |{h ∈ U : h ∈ A ∧ h ∈ B}| / |U| estimates Jaccard;
    distinct-union ≈ (|U|-1)·2^60/θ (hashes uniform in [0, 2^60)); when
    the union holds < k hashes the sketch IS the set and the estimates
    are exact. The md5 family makes the sketch content — hence every
    estimate — a pure function of the data, so the DuckDB twin
    reproduces them bit for bit.

    Plan/scale: the corpus-side work is ONE distinct over (source, hash)
    + a per-source top-k window — map-side combinable, k rows per source
    out. The pairwise stage touches only sketches (sources² · k rows).
    The exact-Jaccard audit joins distinct token sets per pair — the
    one corpus-sized pairwise stage, kept because sources is a bounded
    dimension (drop it at true scale and the query is pure sketch
    algebra)."""
    from nbi_oedi_etl_spark.operators.sketches import _portable_hash

    docs = read_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.trim("text")), " ")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .distinct()
    )
    hashes = toks.select("source", _portable_hash(F.col("tok")).alias("h")).distinct()
    wk = Window.partitionBy("source").orderBy("h")
    sk = (
        hashes.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= _KMV_K)
        .select("source", "h")
    )
    srcs = sk.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("sa"))
        .crossJoin(srcs.select(F.col("source").alias("sb")))
        .where(F.col("sa") < F.col("sb"))
    )
    merged = (
        pairs.join(
            sk.select(F.col("source").alias("sa"), "h", F.lit(1).alias("in_a")),
            "sa",
        )
        .select("sa", "sb", "h", "in_a", F.lit(0).alias("in_b"))
        .unionAll(
            pairs.join(
                sk.select(F.col("source").alias("sb"), "h", F.lit(1).alias("in_b")),
                "sb",
            ).select("sa", "sb", "h", F.lit(0).alias("in_a"), "in_b")
        )
        .groupBy("sa", "sb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wu = Window.partitionBy("sa", "sb").orderBy("h")
    bottom = merged.withColumn("rn", F.row_number().over(wu)).where(
        F.col("rn") <= _KMV_K
    )
    est = bottom.groupBy("sa", "sb").agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("theta"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("k_inter"),
    )
    est_union = F.when(
        F.col("k_used") < _KMV_K, F.col("k_used").cast("double")
    ).otherwise(
        (F.col("k_used") - 1).cast("double")
        * F.pow(F.lit(2.0), F.lit(60))
        / F.col("theta")
    )
    est_j = F.col("k_inter") / F.col("k_used")
    est = est.select(
        "sa",
        "sb",
        "k_used",
        F.round(est_j, 6).alias("est_jaccard"),
        F.round(est_union, 3).alias("est_union"),
        F.round(est_j * est_union, 3).alias("est_intersection"),
    )
    # exact audit over distinct token sets (bounded: sources is a dimension)
    ta = toks.select(F.col("source").alias("sa"), "tok")
    tb = toks.select(F.col("source").alias("sb"), "tok")
    inter = (
        ta.join(tb, "tok")
        .where(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    exact = (
        inter.join(sizes.select(F.col("source").alias("sa"), F.col("n").alias("na")), "sa")
        .join(sizes.select(F.col("source").alias("sb"), F.col("n").alias("nb")), "sb")
        .select(
            "sa",
            "sb",
            F.round(
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter")),
                6,
            ).alias("exact_jaccard"),
        )
    )
    return est.join(exact, ["sa", "sb"], "left").select(
        "sa", "sb", "k_used", "est_jaccard", "est_union", "est_intersection",
        "exact_jaccard",
    )


KMV_OVERLAP_ORACLE = f"""
WITH toks AS (
  SELECT DISTINCT source, tok FROM (
    SELECT source, unnest(string_split(lower(trim(text)), ' ')) AS tok
    FROM documents
  ) WHERE tok <> ''
), hashes AS (
  SELECT DISTINCT source,
         CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h
  FROM toks
), sk AS (
  SELECT source, h FROM (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM hashes
  ) WHERE rn <= {_KMV_K}
), srcs AS (
  SELECT DISTINCT source FROM sk
), pairs AS (
  SELECT a.source AS sa, b.source AS sb
  FROM srcs a JOIN srcs b ON a.source < b.source
), merged AS (
  SELECT sa, sb, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
    SELECT p.sa, p.sb, s.h, 1 AS in_a, 0 AS in_b
    FROM pairs p JOIN sk s ON s.source = p.sa
    UNION ALL
    SELECT p.sa, p.sb, s.h, 0 AS in_a, 1 AS in_b
    FROM pairs p JOIN sk s ON s.source = p.sb
  ) GROUP BY 1, 2, 3
), bottom AS (
  SELECT sa, sb, h, in_a, in_b FROM (
    SELECT sa, sb, h, in_a, in_b,
           row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
    FROM merged
  ) WHERE rn <= {_KMV_K}
), est AS (
  SELECT sa, sb, count(*) AS k_used, max(h) AS theta,
         sum(in_a * in_b) AS k_inter
  FROM bottom GROUP BY 1, 2
), est2 AS (
  SELECT sa, sb, k_used,
         round(k_inter * 1.0 / k_used, 6) AS est_jaccard,
         round(CASE WHEN k_used < {_KMV_K} THEN CAST(k_used AS DOUBLE)
               ELSE CAST(k_used - 1 AS DOUBLE) * pow(2.0, 60) / theta END,
               3) AS est_union,
         round((k_inter * 1.0 / k_used)
               * (CASE WHEN k_used < {_KMV_K} THEN CAST(k_used AS DOUBLE)
                  ELSE CAST(k_used - 1 AS DOUBLE) * pow(2.0, 60) / theta END),
               3) AS est_intersection
  FROM est
), sizes AS (
  SELECT source, count(*) AS n FROM toks GROUP BY 1
), inter AS (
  SELECT a.source AS sa, b.source AS sb, count(*) AS n_inter
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
), exact AS (
  SELECT i.sa, i.sb,
         round(i.n_inter * 1.0 / (za.n + zb.n - i.n_inter), 6) AS exact_jaccard
  FROM inter i
  JOIN sizes za ON za.source = i.sa
  JOIN sizes zb ON zb.source = i.sb
)
SELECT e.sa, e.sb, e.k_used, e.est_jaccard, e.est_union, e.est_intersection,
       x.exact_jaccard
FROM est2 e LEFT JOIN exact x ON e.sa = x.sa AND e.sb = x.sb
"""


# ------------------------- covariance / correlation matrix


def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact covariance + correlation matrix over the embedding columns —
    distributed outer-product aggregation (the PCA / feature-drift
    input): dims explode WITHIN each row (two chained generators, zero
    shuffle, whole-stage codegen) and collapse into one (i, j)-keyed
    aggregate of dim² cells — the Gram-matrix pattern where the corpus
    never shuffles and map-side partials reduce 100 TB of vectors to
    dim²·n_partitions rows.

    Exactness: per-row products are IEEE doubles (identical in both
    engines), quantized ONCE to the 1e-9 grid with native
    floor(x·10⁹ + 0.5) — a codegen'd long, NOT Spark's round() (which
    routes doubles through BigDecimal: measured 14.3 s → 2.4 s at sf0.1
    for the pair aggregate) — and summed as vectorized BIGINTs
    (order-free, exact). Marginal sums depend only on the single dim, so
    they come from the 1-dim explode (|dims| groups), never duplicated
    across the dim² pairs (the first draft summed sx/sy inside every
    (i,j) group: 3 wide decimal aggregates over dim²·n rows for
    information that is dim·n-sized). Quantization error ≤ 5e-10 per
    product, ≪ the round(cov, 9) surfaced precision. The final
    covariance/correlation formulas run the same scalar double ops on
    both sides; correlation derives from the ROUNDED covariances
    (diagonal joined back, broadcast) so the two outputs are mutually
    consistent."""
    emb = read_table(spark, sf_dir, "embeddings")
    e = emb.select(F.col("embedding").cast("array<double>").alias("emb"))
    q = lambda c: F.floor(c * F.lit(1000000000.0) + F.lit(0.5)).cast(  # noqa: E731
        "bigint"
    )
    d1 = e.select("emb", F.posexplode("emb").alias("i", "xi"))
    d2 = d1.select("i", "xi", F.posexplode("emb").alias("j", "xj")).where(
        F.col("j") >= F.col("i")
    )
    g = d2.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q(F.col("xi") * F.col("xj"))).alias("kxy"),
    )
    marg = (
        e.select(F.posexplode("emb").alias("i", "xi"))
        .groupBy("i")
        .agg(F.sum(q(F.col("xi"))).alias("kx"))
    )
    scale = F.lit(1000000000.0)
    g = (
        g.join(F.broadcast(marg.select(F.col("i"), F.col("kx").alias("kxi"))), "i")
        .join(
            F.broadcast(
                marg.select(F.col("i").alias("j"), F.col("kx").alias("kxj"))
            ),
            "j",
        )
        .select(
            "i",
            "j",
            "n",
            (F.col("kxy").cast("double") / scale).alias("sxy"),
            (F.col("kxi").cast("double") / scale).alias("sx"),
            (F.col("kxj").cast("double") / scale).alias("sy"),
        )
    )
    cov = g.select(
        "i",
        "j",
        "n",
        F.round(
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / F.col("n"), 9
        ).alias("cov"),
    )
    diag = cov.where(F.col("i") == F.col("j")).select(
        F.col("i").alias("d"), F.col("cov").alias("var")
    )
    return (
        cov.join(F.broadcast(diag.withColumnRenamed("d", "i").withColumnRenamed("var", "vi")), "i")
        .join(F.broadcast(diag.withColumnRenamed("d", "j").withColumnRenamed("var", "vj")), "j")
        .select(
            "i",
            "j",
            "n",
            "cov",
            F.when(
                (F.col("vi") > 0) & (F.col("vj") > 0),
                F.round(F.col("cov") / F.sqrt(F.col("vi") * F.col("vj")), 6),
            ).alias("corr"),
        )
    )


EMBEDDING_COVARIANCE_ORACLE = """
WITH d2 AS (
  SELECT ii - 1 AS i, jj - 1 AS j,
         CAST(embedding[CAST(ii AS INTEGER)] AS DOUBLE) AS xi,
         CAST(embedding[CAST(jj AS INTEGER)] AS DOUBLE) AS xj
  FROM embeddings,
       unnest(range(1, len(embedding) + 1)) t1(ii),
       unnest(range(1, len(embedding) + 1)) t2(jj)
  WHERE jj >= ii
), gk AS (
  SELECT i, j, count(*) AS n,
         CAST(sum(CAST(floor(xi * xj * 1000000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS kxy
  FROM d2 GROUP BY 1, 2
), mk AS (
  SELECT ii - 1 AS i,
         CAST(sum(CAST(floor(CAST(embedding[CAST(ii AS INTEGER)] AS DOUBLE)
                             * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS kx
  FROM embeddings, unnest(range(1, len(embedding) + 1)) t1(ii)
  GROUP BY 1
), g AS (
  SELECT gk.i, gk.j, gk.n,
         CAST(gk.kxy AS DOUBLE) / 1000000000.0 AS sxy,
         CAST(mi.kx AS DOUBLE) / 1000000000.0 AS sx,
         CAST(mj.kx AS DOUBLE) / 1000000000.0 AS sy
  FROM gk
  JOIN mk mi ON mi.i = gk.i
  JOIN mk mj ON mj.i = gk.j
), cov AS (
  SELECT i, j, n, round((sxy - sx * sy / n) / n, 9) AS cov FROM g
), diag AS (
  SELECT i AS d, cov AS var FROM cov WHERE i = j
)
SELECT c.i, c.j, c.n, c.cov,
       CASE WHEN vi.var > 0 AND vj.var > 0
            THEN round(c.cov / sqrt(vi.var * vj.var), 6) END AS corr
FROM cov c
JOIN diag vi ON vi.d = c.i
JOIN diag vj ON vj.d = c.j
"""


# ----------------------------------------- lexical diversity


def doc_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical-richness signals: type-token ratio, hapax
    (frequency-1 vocabulary) ratio, and mean token length — the
    vocabulary-quality complement of doc_quality's surface ratios
    (repetitive/templated text scores low TTR and hapax share even when
    length/punctuation look fine).

    Plan: one explode → (doc_id, tok) frequency aggregate → per-doc
    rollup; the two aggregates share the hash(doc_id, ...) partitioning
    (superset → subset), so the corpus shuffles once. All-integer
    counts + two single-rounded divisions: exact."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), " ")).alias("tok")
    ).where(F.col("tok") != "")
    freq = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("f"))
    return freq.groupBy("doc_id").agg(
        F.sum("f").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).alias("n_hapax"),
        F.round(F.count(F.lit(1)) / F.sum("f"), 6).alias("ttr"),
        F.round(
            F.sum(F.col("f") * F.length("tok")) / F.sum("f"), 6
        ).alias("mean_tok_len"),
    )


LEXICAL_DIVERSITY_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
  FROM documents
), t AS (
  SELECT doc_id, tok FROM toks WHERE tok <> ''
), freq AS (
  SELECT doc_id, tok, count(*) AS f FROM t GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(f) AS BIGINT) AS n_tokens,
       count(*) AS n_types,
       CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(count(*) * 1.0 / sum(f), 6) AS ttr,
       round(sum(f * length(tok)) * 1.0 / sum(f), 6) AS mean_tok_len
FROM freq GROUP BY doc_id
"""
