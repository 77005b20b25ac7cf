"""Deduplication operators for training-data pipelines (SURVEY.md §2.12).

Four tiers, each designed for a 100 TB documents table:

- **exact**: group by content hash — one shuffle on a 128-bit key, uniform
  by construction (no skew possible).
- **MinHash + LSH banding**: shingle → minhash signature → band buckets →
  bucket-join. The candidate-pair join is banded so the shuffle key is
  (band_id, band_hash) — bounded bucket sizes, no O(n²) blowup.
- **SimHash**: 64-bit near-dup fingerprint; Hamming-close docs collide on
  band prefixes.
- **n-gram Jaccard verification**: exact Jaccard on candidate pairs only
  (never all-pairs).

All signature computation is built-in expressions (xxhash64, transform,
aggregate) — JVM-side, no Python UDFs, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.operators._util import ensure_parallelism
from nbi_oedi_etl_spark.operators.text import _WS


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: one row per distinct content hash with the canonical
    (minimum) id and the duplicate count.

    Scale: single hash-shuffle on md5(text); partial aggregation means each
    map task emits one row per distinct local hash."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(F.col(id_col)).alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row (the min-id one) per distinct text."""
    ranked = df.withColumn("__h", F.md5(F.col(text_col))).withColumn(
        "__rn", F.row_number().over(Window.partitionBy("__h").orderBy(id_col))
    )
    return ranked.where(F.col("__rn") == 1).drop("__h", "__rn")


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles of normalized text → array<string> (distinct).

    NOTE: higher-order functions (transform/slice/array_join per index) are
    interpreted, not codegen'd — fine for the bounded candidate-verification
    path (ngram_jaccard), but NOT for corpus-wide signature computation.
    Corpus-scale operators use :func:`shingle_hashes` instead."""
    toks = F.split(F.trim(F.lower(text)), _WS)
    count = F.size(toks) - (n - 1)
    idx = F.sequence(F.lit(0), F.greatest(count - 1, F.lit(0)))
    gram = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )
    return F.when(count > 0, F.array_distinct(gram)).otherwise(
        F.array(F.array_join(toks, " "))
    )


def shingle_hashes(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """One row per word-n-gram shingle: (doc_id, h) with h = xxhash64 of the
    n token columns. The corpus-scale shingling path.

    Formulation chosen for whole-stage codegen end-to-end: tokenize →
    posexplode → window ``lead`` to align the next n-1 tokens → one
    multi-argument xxhash64 per shingle. No per-row array allocation, no
    interpreted higher-order functions (measured 20-40× faster than a
    transform/aggregate formulation at sf0.1). The only shuffle is the
    window's hash(doc_id) exchange of token rows — linear in corpus size,
    and the downstream per-doc aggregation reuses the same partitioning, so
    signature computation adds no second shuffle.

    Docs shorter than n tokens emit a single partial shingle (pos 0) so
    every doc has at least one hash — mirrors :func:`shingles`' fallback.
    """
    t = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.trim(F.lower(F.col(text_col))), _WS)).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    lead_cols = [F.lead("tok", i).over(w).alias(f"t{i}") for i in range(1, n)]
    t = t.select("doc_id", "pos", "tok", *lead_cols)
    last = F.col(f"t{n - 1}") if n > 1 else F.col("tok")
    t = t.where(last.isNotNull() | (F.col("pos") == 0))
    hash_args = [F.col("tok")] + [
        F.coalesce(F.col(f"t{i}"), F.lit("")) for i in range(1, n)
    ]
    return t.select("doc_id", F.xxhash64(*hash_args).alias("h"))


_LONG_MAX = (1 << 63) - 1


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: for seed s in 0..k-1, min over shingles of
    xxhash64(shingle, s) → array<bigint> of length k.

    xxhash64 with distinct seeds plays the role of k independent hash
    functions; entirely JVM-side.

    Single-pass formulation: one transform computes all k hashes per
    shingle, then one aggregate folds an elementwise min. The naive
    alternative — k separate ``array_min(transform(shingles, …))`` — gets
    the shingle subexpression COPIED k times by projection collapse (no CSE
    across expression trees), turning O(shingles) into O(k × shingles):
    measured 200+ s vs seconds at sf0.1."""

    def _hash_all(x: Column) -> Column:
        return F.array(*[F.xxhash64(x, F.lit(s)) for s in range(num_hashes)])

    hash_arrays = F.transform(shingle_col, _hash_all)
    init = F.array_repeat(F.lit(_LONG_MAX).cast("long"), num_hashes)
    return F.aggregate(
        hash_arrays, init, lambda acc, h: F.zip_with(acc, h, lambda a, b: F.least(a, b))
    )


def band_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """The exploded LSH banding frame (doc_id, band_id, band_hash) — the
    single definition of the shingle → minhash → band-hash pipeline,
    shared by the in-memory ``minhash_lsh_candidates`` self-join and the
    at-rest ``operators/banded_layout`` forms, so the two banding paths
    assign byte-identical band hashes by construction.

    Scale notes (measured, see minhash_signature): the k min-aggregates
    run in one codegen'd hash aggregate with map-side partials (shuffle =
    one row per doc); the band hash is one multi-arg xxhash64 over the
    band's signature slots — no string join, no array allocation; the
    ``bands``-struct array literal is codegen'd (unlike transform over a
    sequence)."""
    rows_per_band = num_hashes // bands
    df = ensure_parallelism(df)
    hashes = shingle_hashes(df, text_col, id_col, shingle_n)
    # xxhash64(h, seed) rehashes the 8-byte shingle hash per seed — k
    # independent-enough hash functions without re-hashing the shingle
    # STRING k times.
    sig = hashes.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.col("h"), F.lit(s))).alias(f"m{s}")
            for s in range(num_hashes)
        ]
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.xxhash64(
                *[F.col(f"m{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_hash")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate CANDIDATE pairs via MinHash-LSH banding.

    Docs sharing any band (rows-per-band = num_hashes/bands consecutive
    signature entries) collide in a bucket; bucket-join yields candidates.

    Scale: the only shuffle key is (band_id, band_hash). A doc emits
    ``bands`` rows, so the exploded table is bands×n rows; join fan-out is
    bounded by bucket size (hash buckets, near-uniform unless docs really are
    duplicates — which is the signal). Output: (doc_id_a, doc_id_b) with
    a < b, distinct."""
    banded = band_rows(df, text_col, id_col, num_hashes, bands, shingle_n)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for given candidate pairs.

    Joins shingle sets onto the (small) candidate-pair table; intersection/
    union via array built-ins. Never computes all-pairs — and never
    computes shingle ARRAYS for the whole corpus either: the pair table is
    cached (bounded: it's the LSH candidate set) and its distinct doc ids
    semi-join the corpus first, so the interpreted-HOF array construction
    (see :func:`shingles`) runs only on candidate docs. Without the
    restriction the HOF cost is corpus-wide (measured ~2 s of the 4.2 s
    near_dup_pipeline_portable total at sf0.1) and grows with corpus, not
    candidate, size."""
    pairs = pairs.cache()
    ids = (
        pairs.select(F.col("doc_id_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_id_b").alias("doc_id")))
        .distinct()
    )
    sh = df.join(ids, df[id_col] == ids["doc_id"], "left_semi").select(
        F.col(id_col).alias("doc_id"), shingles(F.col(text_col), shingle_n).alias("sh")
    )
    out = (
        pairs.join(sh.withColumnsRenamed({"doc_id": "doc_id_a", "sh": "sh_a"}), "doc_id_a")
        .join(sh.withColumnsRenamed({"doc_id": "doc_id_b", "sh": "sh_b"}), "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                * F.lit(1.0)
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
    )
    return out


def simhash_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_bits: int = 16,
    shingle_n: int = 2,
) -> DataFrame:
    """64-bit SimHash per doc + prefix buckets — docs in the same bucket are
    near-dup candidates (one rotation; production would use multiple
    permuted tables).

    Formulation: codegen'd shingle hashing (:func:`shingle_hashes`) → 64
    signed bit-tally SUMs in one vectorized hash aggregate → recombine sign
    bits into the fingerprint. One shuffle on doc_id (uniform — each doc
    contributes only its own shingles, bounded by doc length); partial
    aggregation collapses it to one row per doc. A per-row aggregate() over
    64 bit positions would copy the shingle subexpression 64× (no CSE
    across expression trees) — same trap as minhash, avoided the same way."""
    sh = shingle_hashes(ensure_parallelism(df), text_col, id_col, shingle_n)
    tallies = sh.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    weights = [
        F.when(F.col(f"b{i}") > 0, F.lit(2**i if i < 63 else -(2**63)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for i in range(64)
    ]
    simhash = weights[0]
    for w in weights[1:]:
        simhash = simhash + w
    return tallies.select("doc_id", simhash.alias("simhash")).withColumn(
        "bucket", F.shiftrightunsigned(F.col("simhash"), 64 - prefix_bits)
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Transitive closure of near-dup pairs → duplicate clusters: iterative
    min-label propagation. Output: (node, component) where component is the
    smallest node id reachable; doc_ids absent from ``pairs`` are singletons
    and not emitted.

    This is the step every real dedup pipeline needs between pair generation
    and row dropping — pairs (1,2),(2,3) must collapse to ONE cluster {1,2,3}
    keeping a single canonical doc, which no single join expresses.

    Each iteration is one join + one hash aggregate (all distributed; the
    driver sees only a 1-row convergence probe). ``localCheckpoint``
    truncates the plan lineage per round — without it the DAG doubles every
    iteration. Dedup graphs are cliques/short chains, so rounds ≈ 2-4; at
    100 TB with adversarial long chains, use
    :func:`connected_components_star` (O(log diameter) rounds) — same
    (node, component) contract, property-tested to agree on random
    graphs."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    comp = edges.select("u").distinct().select(
        F.col("u").alias("node"), F.col("u").alias("component")
    )
    for _ in range(max_iterations):
        nbr_min = (
            edges.join(comp, edges.v == comp.node)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        staged = comp.join(nbr_min, comp.node == nbr_min.u, "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce("nbr_component", F.col("component"))
            ).alias("component"),
            (F.col("nbr_component") < F.col("component")).alias("changed"),
        ).localCheckpoint()
        comp = staged.select("node", "component")
        if staged.where("changed").limit(1).count() == 0:
            break
    return comp


def connected_components_star(
    pairs: DataFrame,
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14 — public algorithm). Same (node, component) contract as
    :func:`connected_components`, different convergence economics: each
    operation halves tree heights, so rounds are O(log diameter) instead
    of the O(diameter) of min-label propagation — the fallback for
    adversarial chain-shaped duplicate graphs (serial plagiarism, boiler-
    plate drift) where a 10⁶-hop chain would take 10⁶ label rounds but
    ~20 star rounds.

    large-star: every node u links each STRICTLY GREATER neighbor to the
    minimum m(u) of its closed neighborhood; small-star: edges oriented
    high→low, every node links its not-greater neighbors (and itself) to
    m(u). Both are one groupBy + one join per round — shuffle volume
    O(edges), no driver-side data beyond the convergence probe (a
    checksum-stability check, order-insensitive). Fixpoint = a star
    forest: every node points at its component minimum directly."""
    sym = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = (
        sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def _closed_min(e: DataFrame) -> DataFrame:
        # m(u) = min of the CLOSED neighborhood (neighbors ∪ {u})
        return e.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least("mn", F.col("u")).alias("m")
        )

    from pyspark.sql import Observation

    small = edges
    prev_sig = None
    for r in range(max_iterations):
        # ---- large-star: (v, m(u)) for each v ∈ N(u) with v > u
        m = _closed_min(edges)
        large = (
            edges.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # ---- small-star over high→low oriented edges: (v, m(u)) for each
        # v ∈ N(u) ∪ {u} − {m(u)}
        oriented = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        m2 = _closed_min(oriented)
        # ONE materialization job per round: only ``small`` checkpoints
        # (large/oriented are within-round lineage whose repeated
        # subtrees collapse to ReusedExchange), and the convergence
        # signature rides the checkpoint job as an Observation instead
        # of a separate collect — measured 4 jobs/round → 1. The
        # signature is order-insensitive: (count, sum of row hashes),
        # accumulated in decimal(38,0) — a long sum of 64-bit hashes
        # overflows (and ANSI mode makes that an error, correctly).
        obs = Observation(f"star_round_{r}")
        small = (
            oriented.join(m2, "u")
            .select(F.col("v").alias("n"), F.col("m"))
            .union(m2.select(F.col("u").alias("n"), F.col("m")))
            .where(F.col("n") != F.col("m"))
            .select(F.col("n").alias("u"), F.col("m").alias("v"))
            .distinct()
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
            )
            .localCheckpoint()
        )
        sig = (obs.get["n"], obs.get["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
        # re-symmetrize for the next large-star round (lineage is one
        # union+distinct above the checkpointed ``small`` — no growth)
        edges = small.union(
            small.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
    # At the fixpoint ``small`` IS the star forest (node → component min);
    # add the centers' self-rows so the output matches min-label
    # propagation's contract exactly (every node of ``pairs`` appears).
    stars = small.select(F.col("u").alias("node"), F.col("v").alias("component"))
    centers = stars.select("component").distinct().select(
        F.col("component").alias("node"), "component"
    )
    return stars.union(centers)


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    components: DataFrame | None = None,
) -> DataFrame:
    """Cluster summary over the components of ``pairs``: one row per
    duplicate cluster with its canonical (minimum) doc id and size. The
    keep-list at scale is ``docs`` anti-joined to members minus canonicals.
    Pass a precomputed ``components`` (node, component) table to reuse a
    shared closure stage instead of re-running the propagation."""
    comp = components if components is not None else connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("node").alias("canonical_doc_id"),
        )
        .where(F.col("cluster_size") > 1)
    )


def latest_by_key(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreaks: list[str] | None = None,
) -> DataFrame:
    """Snapshot compaction / CDC-upsert shape: keep the LATEST row per key
    (max order_col, ties broken by `tiebreaks` descending so the winner is
    unique). The standard "latest document version wins" op in a
    training-data pipeline fed by incremental crawls.

    Scale: ONE shuffle on the key; since Spark 3.5 the rank<=1 filter
    rewrites to WindowGroupLimit, so each map task pre-prunes to its local
    top-1 per key before the exchange — shuffle volume is ~|distinct keys|,
    not |rows| (asserted in tests/test_plans.py)."""
    order = [F.desc(order_col)] + [F.desc(t) for t in (tiebreaks or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
