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
    """Word n-gram shingles of normalized text → array<string> (distinct)."""
    toks = F.split(F.trim(F.lower(text)), _WS)
    count = F.size(toks) - (n - 1)
    idx = F.sequence(F.lit(0), F.greatest(count - 1, F.lit(0)))
    gram = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )
    return F.when(count > 0, F.array_distinct(gram)).otherwise(
        F.array(F.array_join(toks, " "))
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: for seed s in 0..k-1, min over shingles of
    xxhash64(shingle, s) → array<bigint> of length k.

    xxhash64 with distinct seeds plays the role of k independent hash
    functions; entirely JVM-side."""
    def _minhash(seed: int) -> Column:
        # Outer-function binding: HOF lambdas must be single-arity.
        return F.array_min(F.transform(shingle_col, lambda sh: F.xxhash64(sh, F.lit(seed))))

    return F.array(*[_minhash(s) for s in range(num_hashes)])


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
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("doc_id"),
        minhash_signature(shingles(F.col(text_col), shingle_n), num_hashes).alias("sig"),
    )
    banded = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")
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
    union via array built-ins. Never computes all-pairs."""
    sh = df.select(
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


def simhash64(text_col: Column, shingle_n: int = 2) -> Column:
    """64-bit SimHash over word shingles.

    For each of 64 bit positions, sum +1/-1 weighted by whether
    xxhash64(shingle) has that bit set; sign of the sum gives the output bit.
    Expressed with aggregate() over the shingle array — JVM higher-order
    functions, no UDF."""
    sh = shingles(text_col, shingle_n)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    def _tally(bit: int) -> Column:
        # sum over shingles of (bit_i(hash) ? 1 : -1); outer-function binding
        # because HOF lambdas must be exactly binary for aggregate().
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    bits = []
    for i in range(64):
        tally = _tally(i)
        bits.append(F.when(tally > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")) * F.lit(2**i if i < 63 else -(2**63)).cast("long"))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def simhash_buckets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", prefix_bits: int = 16
) -> DataFrame:
    """SimHash each doc and bucket by the top ``prefix_bits`` bits — docs in
    the same bucket are near-dup candidates (one rotation; production would
    use multiple permuted tables)."""
    sim = df.select(
        F.col(id_col).alias("doc_id"), simhash64(F.col(text_col)).alias("simhash")
    )
    return sim.withColumn(
        "bucket", F.shiftrightunsigned(F.col("simhash"), 64 - prefix_bits)
    )
