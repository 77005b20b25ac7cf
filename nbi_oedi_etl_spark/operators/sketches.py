"""Mergeable sketch operators with PORTABLE hash families (Count-Min,
HyperLogLog) — the "approximate but verifiable" tier of the engine.

The usual objection to oracle-checking approximate operators is that the
estimate is engine-defined. Both sketches here sidestep that: given a
deterministic hash family (md5-derived, available identically in Spark and
DuckDB), the sketch content — and therefore the estimate — is a pure
function of the data, so an external SQL oracle reproduces it EXACTLY.
What stays approximate is the relationship to ground truth, which the
bundled queries also surface (true count next to estimate).

Scale posture: both sketches are classic distributive aggregates —
  - CMS build: groupBy over (depth × width) cells; map-side partial
    aggregation collapses any token volume to ≤ cells·n_partitions rows
    before the shuffle. The 100 TB corpus shuffles ~KBs.
  - HLL build: groupBy over m registers with max() partials — same story.
    No distinct, no dedup shuffle: duplicate inserts cannot change a
    register max, which is the entire point of the sketch.
Merging shards/streams = elementwise sum (CMS) / max (HLL) of the same
cells — the groupBy IS the merge.

References: Cormode & Muthukrishnan (CMS, 2005); Flajolet et al. (HLL,
2007). Formulas follow the published papers (alpha_64 = 0.709, linear
counting below 2.5·m with empty registers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _portable_hash(col, seed: int | None = None, hex_chars: int = 15):
    """md5-derived BIGINT hash, reproducible in any engine with md5():
    first ``hex_chars`` hex digits. ≤15 hex chars keeps the value under
    2^60 — exact in BIGINT, but NOT in DOUBLE (doubles are exact only to
    2^53), so derived quantities must use integer/bit arithmetic
    (shiftright, %), never float division."""
    keyed = col if seed is None else F.concat(F.lit(f"{seed}|"), col)
    return F.conv(F.substring(F.md5(keyed), 1, hex_chars), 16, 10).cast("bigint")


def tokens_of(
    docs: DataFrame, text_col: str = "text", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Whitespace tokens, lowercased; the shared input shape for both
    sketches (single-space split to stay in lockstep with SQL twins).
    Works unchanged on a STREAMING DataFrame (narrow ops only).
    ``keep_cols`` carries grouping columns (e.g. source) through."""
    return docs.select(
        *keep_cols,
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), " ")).alias("tok"),
    ).where(F.col("tok") != "")


def cms_cells(toks: DataFrame, depth: int, width: int) -> DataFrame:
    """CMS build aggregate: (seed, bucket, cell) counts — the mergeable
    sketch state (merge = sum of cells with the same key). Shared by the
    batch query and streaming foreachBatch accumulation."""
    seeds = F.explode(F.array(*[F.lit(s) for s in range(depth)])).alias("seed")
    return (
        toks.select("tok", seeds)
        .select(
            "seed",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("tok"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % width
            ).alias("bucket"),
        )
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cell"))
    )


def hll_registers(
    toks: DataFrame, m: int, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """HLL build aggregate: (group_cols…, j, reg) register maxima — the
    mergeable sketch state (merge = max of registers with the same key).
    ``m`` must be a power of two; the remainder w = h // m carries
    60 - log2(m) bits, so rho (leading-zero count + 1) is computed
    against THAT width — a fixed 54-bit assumption silently corrupts
    registers for any other m (caught by the micro-batch merge test at
    m=16). Register values are always ≥ 1; 0 is reserved for "never
    touched". With ``group_cols`` the state is |groups|×m rows — the
    approx-COUNT(DISTINCT)-per-group replacement for the exact dedup
    shuffle."""
    import math

    p = round(math.log2(m))
    if 2**p != m:
        raise ValueError(f"m must be a power of two, got {m}")
    w_bits = 60 - p
    h = _portable_hash(F.col("tok"), hex_chars=15)
    # w via bit shift, not F.floor(h / m): h carries 60 bits and doubles are
    # exact only to 2^53, so float division disagrees with the oracle's
    # integer h // m for ~40% of large hashes. m is a power of two, so
    # shiftright(h, p) IS exact integer division (and h % m stays exact).
    base = toks.select(
        *group_cols,
        (h % m).alias("j"),
        F.shiftright(h, p).alias("w"),
    ).select(
        *group_cols,
        "j",
        F.when(F.col("w") == 0, F.lit(w_bits + 1))
        .otherwise(F.lit(w_bits + 1) - F.length(F.bin(F.col("w"))))
        .alias("rho"),
    )
    return base.groupBy(*group_cols, "j").agg(F.max("rho").alias("reg"))


def cms_topk_estimates(
    docs: DataFrame, depth: int = 4, width: int = 256, k: int = 20
) -> DataFrame:
    """Count-Min sketch over document tokens, read back for the top-k
    true-frequent tokens: (token, true_count, cms_estimate).

    Build: every token increments cell (seed, md5(seed|tok) % width) for
    each of ``depth`` seeds; the build aggregate's key space is
    depth×width cells, so partial aggregation makes the shuffle O(cells),
    not O(tokens). Read: estimate(t) = min over seeds of its cell — the
    classic upper-bound guarantee (estimate ≥ true, with overcount ≤
    εN at probability 1-δ for width=e/ε, depth=ln(1/δ)).

    The true counts (one vocab-wide shuffle) are computed only to pick
    the read-back keys and expose estimation error next to truth.
    """
    toks = tokens_of(docs)
    sketch = cms_cells(toks, depth, width)
    return cms_decode_topk(toks, sketch, depth=depth, width=width, k=k)


def cms_decode_topk(
    toks: DataFrame, sketch: DataFrame, depth: int, width: int, k: int
) -> DataFrame:
    """CMS read-back stage, decoupled from the build so it also serves a
    DRAINED streaming sketch (the build aggregate is mergeable — the
    streaming groupBy IS the merge, so batch-built and stream-built cells
    are identical and one decode serves both): probe the top-k
    true-frequent tokens against the (seed, bucket, cell) table and take
    the per-token min cell."""
    seeds = F.explode(F.array(*[F.lit(s) for s in range(depth)])).alias("seed")
    true_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_count"))
    w = Window.orderBy(F.desc("true_count"), F.asc("tok"))
    topk = true_counts.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    probes = topk.select("tok", "true_count", seeds).select(
        "tok",
        "true_count",
        "seed",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("tok"))), 1, 8),
                16,
                10,
            ).cast("bigint")
            % width
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("tok", "true_count")
        .agg(F.min("cell").alias("cms_estimate"))
        .select(F.col("tok").alias("token"), "true_count", "cms_estimate")
    )


def hll_distinct_estimate(docs: DataFrame, m: int = 64) -> DataFrame:
    """HyperLogLog distinct-token estimate with m=64 registers
    (alpha_64 = 0.709), next to the exact distinct count.

    h = 60-bit md5 hash; register j = h mod m; rho = leading-zero count
    of the remaining 54 bits + 1 (via string length of bin(w) — portable);
    register value = max(rho). The register table is the ONLY state —
    the build shuffles m rows with max() partials regardless of corpus
    size, and never dedups. Linear counting (m·ln(m/V)) kicks in below
    2.5·m when V registers are empty, per the paper.

    Both the registers and the final double arithmetic are deterministic
    given the hash family, so the estimate is value-hash-checkable; the
    integer rounding removes any cross-engine libm ulp concern.
    """
    toks = tokens_of(docs)
    regs = hll_registers(toks, m)
    return hll_decode(toks, regs, m)


def hll_decode(
    toks: DataFrame,
    regs: DataFrame,
    m: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """HLL estimate read-back, decoupled from the build so it also serves
    a DRAINED streaming register table (max() is distributive — the
    streaming groupBy IS the register merge, so stream-built and
    batch-built registers are identical and one decode serves both).
    ``toks`` supplies the exact-truth column shown beside the estimate.

    The 2^-reg harmonic sum runs as a SORTED array fold (registers
    packed j-ascending) in the global AND grouped cases: the terms are
    powers of two spanning 2^0..2^-(60-log2(m)), which are not
    sum-order-safe in double."""
    gc = list(group_cols)
    jrange = regs.sparkSession.range(m).withColumnRenamed("id", "j")
    if gc:
        grid = regs.select(*gc).distinct().crossJoin(jrange)
        full = grid.join(regs, [*gc, "j"], "left").select(
            *gc, "j", F.coalesce("reg", F.lit(0)).alias("reg")
        )
        packed = full.groupBy(*gc)
    else:
        full = jrange.join(regs, "j", "left").select(
            "j", F.coalesce("reg", F.lit(0)).alias("reg")
        )
        packed = full
    packed = packed.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "reg"))), lambda x: x["reg"]
        ).alias("regs")
    )
    raw = (F.lit(0.709 * m * m)) / F.aggregate(
        F.transform(F.col("regs"), lambda r: F.pow(F.lit(2.0), -r)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    v_empty = F.size(F.filter(F.col("regs"), lambda r: r == 0))
    est = F.when(
        (raw <= 2.5 * m) & (v_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty),
    ).otherwise(raw)
    estimates = packed.select(
        *gc,
        F.round(est).cast("bigint").alias("hll_estimate"),
        v_empty.alias("v_empty"),
        F.lit(m).cast("int").alias("n_registers"),
    )
    truth = toks.groupBy(*gc).agg(F.count_distinct("tok").alias("true_distinct")) if gc else toks.agg(
        F.count_distinct("tok").alias("true_distinct")
    )
    joined = truth.join(estimates, gc) if gc else truth.crossJoin(estimates)
    return joined.select(
        *gc, "true_distinct", "hll_estimate", "n_registers", "v_empty"
    )


def bloom_bit_positions(items: DataFrame, col: str, m: int, k: int) -> DataFrame:
    """Bloom-filter BUILD: the distinct bit positions set by hashing each
    item k times into an m-bit domain (portable md5 family). The result —
    at most m rows of a single int column — IS the filter; at 100 TB it is
    dimension-table-sized by construction (≤ m rows no matter how many
    items were inserted), so it broadcasts."""
    pos = [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"b{i}|"), F.col(col))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % m
        ).alias("p")
        for i in range(k)
    ]
    return (
        items.select(F.explode(F.array(*pos)).alias("bit_pos")).distinct()
    )


def bloom_probe_counts(
    probes: DataFrame,
    bloom: DataFrame,
    col: str,
    group_cols: list[str],
    m: int,
    k: int,
) -> DataFrame:
    """Bloom-filter PROBE: an item is maybe-member iff ALL k of its bit
    positions are set. Mechanism: explode each probe item to its k
    positions, broadcast-join the (≤ m row) filter, and require k hits —
    a shuffle-free membership test over the probe side (the per-group
    count agg is the only wide stage). Guarantees mirror the paper: no
    false negatives; false-positive rate ≈ (1-e^{-kn/m})^k.

    Output: group_cols + (n_items, n_maybe_member). NOTE: probes are
    grouped by (group_cols, item) before counting, so duplicate (group,
    item) probe ROWS are collapsed — n_items counts DISTINCT items per
    group, not probe rows. If row multiplicity ever matters, pre-aggregate
    a count column and sum it instead of relying on row counts here."""
    pos = [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"b{i}|"), F.col(col))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % m
        ).alias(f"p{i}")
        for i in range(k)
    ]
    exploded = probes.select(
        *group_cols, F.col(col).alias("_item"), F.posexplode(F.array(*pos)).alias("_i", "bit_pos")
    )
    hits = (
        exploded.join(F.broadcast(bloom.withColumn("_set", F.lit(1))), "bit_pos", "left")
        .groupBy(*group_cols, "_item")
        .agg(
            (F.sum(F.coalesce("_set", F.lit(0))) == k).alias("maybe_member")
        )
    )
    return hits.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.when(F.col("maybe_member"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_maybe_member"),
    )
