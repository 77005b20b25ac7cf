"""At-rest IVF layout: the corpus written partitioned by coarse cell, so
a probe reads only its cells' files — a partition-pruned scan instead of
a full pass (SCALE.md's "at rest the corpus would be written bucketed by
cell", implemented r9).

``operators/similarity.py::ivf_topk`` is the in-memory form: codebook →
assign → probe-join, one full corpus scan per query batch. At 100 TB the
corpus does not fit a per-batch scan; this module materializes the
assignment ONCE (`write_ivf_layout`, hive-partitioned by ``cell``) and
every later probe (`probe_ivf_layout`) filters on the probed cells'
partition values — Catalyst prunes the scan to n_probe/n_cells of the
files (PartitionFilters, plan-asserted in tests/test_plans.py). Results
are identical to ``ivf_topk`` for the same (n_cells, n_probe, seed):
same hash-ordered codebook, same argmax assignment, same exact re-rank.

Contract: the probe path collects the UNION of the query batch's probed
cells on the driver (n_queries × n_probe ints — metadata-scale; query
batches are broadcast-sized by construction, as in ivf_topk). The
codebook is O(n_cells × dim), returned by the writer and persistable as
a tiny side file.

Reference parity: the reference has no vector search; this is part of
the §2.12 training-data-pipeline extension (SURVEY.md), scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from nbi_oedi_etl_spark.operators.similarity import _rank_topk, cosine


def ivf_codebook(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Deterministic coarse codebook: unit-norm centroids (dim × cells)
    drawn as a hash-ordered sample — byte-identical to ivf_topk's, so the
    two forms assign identical cells."""
    rows = (
        corpus.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        )
        .orderBy(F.xxhash64(F.col("id"), F.lit(seed)))
        .limit(n_cells)
        .collect()
    )
    if not rows:
        raise ValueError("empty corpus: no codebook")
    cent = np.asarray([r["v"] for r in rows], dtype=np.float64)
    return (cent / np.linalg.norm(cent, axis=1, keepdims=True)).T


def _cell_udf(cent_unit: np.ndarray):
    @pandas_udf("int")
    def _cell(v: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        sims = mat @ cent_unit
        return pd.Series(np.argmax(sims, axis=1).astype("int32"))

    return _cell


def write_ivf_layout(
    corpus: DataFrame,
    dest: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    mode: str = "error",
) -> np.ndarray:
    """Materialize the corpus hive-partitioned by IVF cell; returns the
    codebook (unit centroids, dim × cells) the probe side needs. One full
    scan ever; every later probe is partition-pruned."""
    cent_unit = ivf_codebook(corpus, n_cells, id_col, vec_col, seed)
    assigned = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("emb"),
    ).withColumn("cell", _cell_udf(cent_unit)(F.col("emb")))
    assigned.write.mode(mode).partitionBy("cell").parquet(dest)
    return cent_unit


def probe_ivf_layout(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    cent_unit: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe over the at-rest layout: per-query n_probe nearest cells,
    scan ONLY those cells' partitions (static ``cell IN (...)`` filter →
    PartitionFilters), exact cosine re-rank of the candidates. Same
    output as ``ivf_topk`` at equal knobs."""
    q_rows = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_emb"),
    ).collect()
    if not q_rows:
        empty = spark.read.parquet(path).where(F.lit(False))
        return empty.select(
            F.lit(0).alias("query_id"),
            F.col("vec_id"),
            F.lit(0.0).alias("cos_sim"),
            F.lit(0).alias("rank"),
        )
    q_mat = np.asarray([r["q_emb"] for r in q_rows], dtype=np.float64)
    probe = np.argsort(-(q_mat @ cent_unit), axis=1)[:, :n_probe].astype("int32")
    probed_cells = sorted({int(c) for row in probe for c in row})
    q = spark.createDataFrame(
        [
            (r["query_id"], r["q_emb"], [int(c) for c in row])
            for r, row in zip(q_rows, probe)
        ],
        "query_id long, q_emb array<double>, cells array<int>",
    ).select("query_id", "q_emb", F.explode("cells").alias("cell"))
    # static partition-value predicate: Catalyst prunes the file listing
    # to the probed cells before any IO
    c = spark.read.parquet(path).where(F.col("cell").isin(probed_cells))
    cand = c.join(F.broadcast(q), "cell").where(F.col("vec_id") != F.col("query_id"))
    return _rank_topk(
        cand.select(
            "query_id", "vec_id", cosine(F.col("emb"), F.col("q_emb")).alias("sim")
        ),
        k,
    )
