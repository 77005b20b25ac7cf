"""Driver-oracled twin of the at-rest LSH banding layout (r10).

``operators/banded_layout`` is plan-pinned and parity-tested against the
in-memory self-join, but its production xxhash64 band hashes cannot be
reproduced in DuckDB — so, like ``minhash_lsh_portable`` for the
in-memory form, this module runs the SAME write→probe layout machinery
under the md5-portable hash family (``workload_ext._portable_signatures``,
the shared signature pipeline) and value-hash-checks the result
cross-engine. The layout path itself (hive-partition by pcell, sidecar,
static IN-list prune, band-key join) is byte-for-byte the production
code — only the banding family is swapped through the documented
``banded_rows`` extension point.

Corpus/batch split: doc_id % 5 (batch = the 0-residue fifth, the CDC
"new documents" side), mirroring ``incremental_dedup_new_docs``'s shape.

Reference parity: no reference analogue (§2.12 extension, scale path).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nbi_oedi_etl_spark import workload_ext as ext
from nbi_oedi_etl_spark.operators.banded_layout import (
    probe_banded_layout,
    write_banded_layout,
)

#: 4 bands × 2 signature slots — the banding of _portable_minhash_pairs.
_BANDS = 4


def _portable_band_rows(sig: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_hash) under the md5-portable family: the
    band hash is the same hex→bigint md5 bridge the signatures use,
    applied to the band's two signature slots — equal band hashes ⟺
    equal (v1, v2) pairs (md5 collisions aside), so the layout join
    matches exactly the (v1, v2) equi-join the oracle runs."""
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.col(f"m{2 * b}"), F.col(f"m{2 * b + 1}"))),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("band_hash"),
        )
        for b in range(_BANDS)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("b")
    ).select("doc_id", "b.band_id", "b.band_hash")


_LAYOUT_CACHE: dict = {}


def banded_layout_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end at-rest probe under the portable family: write the
    corpus fifth's band rows hive-partitioned ONCE per session
    (memoized like the signature pipeline it reuses), then probe with
    the batch fifth — candidate pairs (doc_id_new, doc_id_corpus)."""
    sig = ext.portable_signatures_cached(spark, sf_dir)
    banded = _portable_band_rows(sig)

    def build() -> str:
        dest = tempfile.mkdtemp(prefix="banded_portable_") + "/layout"
        write_banded_layout(
            None,
            dest,
            n_buckets=16,
            banded_rows=banded.where(F.col("doc_id") % 5 != 0),
        )
        return dest

    dest = ext._memo_get(_LAYOUT_CACHE, spark, sf_dir, build)
    return probe_banded_layout(
        spark, dest, banded_rows=banded.where(F.col("doc_id") % 5 == 0)
    )


# The oracle recomputes the portable signatures (the CTE chain of
# MINHASH_PORTABLE_ORACLE) and joins bands across the % 5 split on the
# raw (v1, v2) slots — equal md5 band hashes ⟺ equal slots, so the
# engines agree without DuckDB needing the band-hash bridge itself.
BANDED_LAYOUT_PORTABLE_ORACLE = r"""
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
  FROM sh, range(8) t(seed)
  GROUP BY doc_id, seed
), sig AS (
  SELECT doc_id, list(m ORDER BY seed) AS sig FROM hs GROUP BY doc_id
), b AS (
  SELECT doc_id, band, sig[2*band+1] AS v1, sig[2*band+2] AS v2
  FROM sig, range(4) t(band)
)
SELECT DISTINCT q.doc_id AS doc_id_new, c.doc_id AS doc_id_corpus
FROM b q JOIN b c ON q.band = c.band AND q.v1 = c.v1 AND q.v2 = c.v2
WHERE q.doc_id % 5 = 0 AND c.doc_id % 5 != 0
"""
