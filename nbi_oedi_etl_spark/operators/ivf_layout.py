"""At-rest IVF layout: the corpus written partitioned by coarse cell, so
a probe reads only its cells' files — a partition-pruned scan instead of
a full pass (SCALE.md's "at rest the corpus would be written bucketed by
cell", implemented r9).

``operators/similarity.py::ivf_topk`` is the in-memory form: codebook →
assign → probe-join, one full corpus scan per query batch. At 100 TB the
corpus does not fit a per-batch scan; this module materializes the
assignment ONCE (`write_ivf_layout`, hive-partitioned by ``cell``) and
every later probe (`probe_ivf_layout`) filters on the probed cells'
partition values — Catalyst prunes the file listing to n_probe/n_cells
of the files (PartitionFilters, plan-asserted in tests/test_plans.py).
Results are identical to ``ivf_topk`` for the same (n_cells, n_probe,
seed): both forms call the SAME ``ivf_codebook`` / ``ivf_cell_udf`` /
``ivf_probe_udf`` helpers, so equivalence is structural, not a
copy-that-must-not-drift.

Contract: the probe path collects the UNION of the query batch's probed
cells on the driver (≤ n_cells ints — metadata-scale; query batches are
broadcast-sized by construction, as in ivf_topk). The codebook is
O(n_cells × dim), returned by the writer and persistable as a tiny side
file.

Reference parity: the reference has no vector search; this is part of
the §2.12 training-data-pipeline extension (SURVEY.md), scale path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.operators.similarity import (
    _rank_topk,
    cosine,
    ivf_cell_udf,
    ivf_codebook,
    probe_cells,
)


#: Codebook sidecar (r11): underscore-prefixed like _banded_meta.json so
#: the main parquet read never sees it. n_cells × dim doubles — a few KB
#: of JSON; the layout becomes self-describing (probe/append no longer
#: need the caller to carry the codebook).
_IVF_META_FILE = "_ivf_meta.json"


def _write_ivf_meta(spark: SparkSession, dest: str, cent_unit: np.ndarray) -> None:
    from nbi_oedi_etl_spark.operators.banded_layout import _write_meta

    _write_meta(
        spark,
        dest,
        {
            "n_cells": int(cent_unit.shape[1]),
            "dim": int(cent_unit.shape[0]),
            "codebook": cent_unit.tolist(),  # dim × cells, unit columns
        },
        fname=_IVF_META_FILE,
    )


def read_ivf_codebook(spark: SparkSession, path: str) -> np.ndarray:
    """The layout's own unit-centroid codebook from its sidecar."""
    from nbi_oedi_etl_spark.operators.banded_layout import _read_meta

    m = _read_meta(spark, path, fname=_IVF_META_FILE)
    cent = np.asarray(m["codebook"], dtype=np.float64)
    if cent.shape != (m["dim"], m["n_cells"]):
        raise ValueError(f"corrupt IVF sidecar: shape {cent.shape} != "
                         f"({m['dim']}, {m['n_cells']})")
    return cent


def _assign_cells(
    df: DataFrame, cent_unit: np.ndarray, id_col: str, vec_col: str
) -> DataFrame:
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("emb"),
    ).withColumn("cell", ivf_cell_udf(cent_unit)(F.col("emb")))


def write_ivf_layout(
    corpus: DataFrame,
    dest: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    mode: str = "error",
    cent_unit: np.ndarray | None = None,
) -> np.ndarray:
    """Materialize the corpus hive-partitioned by IVF cell; returns the
    codebook (unit centroids, dim × cells) — also written to the
    ``_ivf_meta.json`` sidecar (r11), so probes and appends can run
    against the layout alone. One full scan ever; every later probe is
    partition-pruned. Pass ``cent_unit`` to lay out under a FIXED
    external codebook (e.g. the incremental-build equivalence test, or
    re-using a production codebook across corpus versions) instead of
    fitting one from this corpus."""
    if cent_unit is None:
        cent_unit = ivf_codebook(corpus, n_cells, id_col, vec_col, seed)
    if cent_unit is None:
        raise ValueError("empty corpus: no codebook")
    assigned = _assign_cells(corpus, cent_unit, id_col, vec_col)
    # repartition by cell before the write so each populated cell is one
    # file instead of one per upstream task (the small-files measurement
    # in tools/banded_layout_probe.py applies identically here). A hot
    # cell becomes a single write task — acceptable for the one-time
    # materialization; re-cluster n_cells upward if a cell outgrows a
    # task (the codebook is the knob, not the writer).
    assigned.repartition("cell").write.mode(mode).partitionBy("cell").parquet(dest)
    _write_ivf_meta(corpus.sparkSession, dest, cent_unit)
    return cent_unit


def append_to_ivf_layout(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental maintenance for the ANN family (r11 — the
    ``append_to_banded_layout`` counterpart): assign ``new_vectors``
    with the LAYOUT'S OWN codebook (sidecar) and append their rows into
    the partitioned layout. Standard IVF practice: the codebook stays
    FIXED across appends (probes stay consistent — a probed cell always
    means the same region).

    Drift note, MEASURED rather than assumed (r11): appending a tight
    drifted mode under the frozen codebook collapsed it into one stale
    cell — which makes that cell HOT (size/balance hazard) but did NOT
    hurt recall at small n_probe (everything relevant sits together:
    stale recall 0.91 vs 0.66 after re-clustering split the mode across
    cells at n_probe=1), and re-clustering n_cells=8 over the union
    barely changed cell purity (0.78 → 0.79). The operational trigger
    for a re-cluster is therefore CELL-SIZE imbalance (a cell outgrowing
    a task), not recall drift alone; monitor cell sizes per append and
    ``ann_recall``-style audits at the probe settings you actually run.
    Appends add one file per touched cell per batch — run
    ``compact_ivf_layout`` periodically (measured cadence maths in
    CDC_DRILL.json apply identically)."""
    cent = read_ivf_codebook(spark, path)
    _assign_cells(new_vectors, cent, id_col, vec_col).repartition(
        "cell"
    ).write.mode("append").partitionBy("cell").parquet(path)


def compact_ivf_layout(
    spark: SparkSession,
    path: str,
    max_files_per_cell: int = 4,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """In-place per-cell compaction after CDC appends; see
    ``compact_banded_layout`` (same shared swap mechanism, probe results
    unchanged — only file packing moves)."""
    from nbi_oedi_etl_spark.operators.banded_layout import (
        _compact_partition_dirs,
    )

    return _compact_partition_dirs(
        spark, path, "cell=", max_files_per_cell, target_file_bytes
    )


#: Dispatch threshold between the driver-side probe (collect the batch,
#: numpy probe math, static partition-pruned scan — the single-job path
#: for the broadcast-sized batches CDC probes use) and the DISTRIBUTED
#: probe (executor-side ``ivf_probe_udf`` + shuffle join against the
#: layout — no driver collect; right when the batch itself is
#: fact-scale, where the probed-cell union approaches every cell and
#: static pruning buys nothing anyway). r11: was a hard ValueError cap.
#: Measured brackets on local[32] (shared host, noisy): the driver path
#: clearly wins up to ~8k queries (3.7-11 s vs 10.6-44 s); at ~17k the
#: two sessions disagreed (driver 23.5 s vs distributed 18.3 s in one,
#: reversed magnitudes in another) — the crossover sits somewhere in
#: 8k-20k here and is host-dependent, so the default is the bracket's
#: low edge and callers pin either branch via ``driver_batch_rows``.
_MAX_PROBE_BATCH_ROWS = 16_384


def _rerank_candidates(c: DataFrame, q: DataFrame, k: int, broadcast_q: bool) -> DataFrame:
    """Shared probe tail: candidate equi-join on cell, self-exclusion
    (native compare on dtype match — ADVICE r9), exact cosine re-rank."""
    corpus_id_t = dict(c.dtypes)["vec_id"]
    query_id_t = dict(q.dtypes)["query_id"]
    if corpus_id_t == query_id_t:
        not_self = F.col("vec_id") != F.col("query_id")
    else:
        not_self = F.col("vec_id").cast("string") != F.col("query_id").cast("string")
    qq = F.broadcast(q) if broadcast_q else q
    cand = c.join(qq, "cell").where(not_self)
    return _rank_topk(
        cand.select(
            "query_id", "vec_id", cosine(F.col("emb"), F.col("q_emb")).alias("sim")
        ),
        k,
    )


def probe_ivf_layout(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    cent_unit: np.ndarray | None = None,
    k: int = 10,
    n_probe: int = 4,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    driver_batch_rows: int | None = None,
) -> DataFrame:
    """IVF probe over the at-rest layout: per-query n_probe nearest cells,
    scan ONLY those cells' partitions (static ``cell IN (...)`` filter →
    PartitionFilters), exact cosine re-rank of the candidates. Same
    output as ``ivf_topk`` at equal knobs, with the query id column's
    NATIVE type preserved. An empty query batch yields an empty result of
    the same schema through the same single code path (the probed-cell set
    is empty, so the partition filter prunes everything).

    Pass structure (ADVICE r9 / VERDICT task 4): the query batch is
    broadcast-sized by contract, so it is collected ONCE and the probe
    math runs driver-side in numpy (``similarity.probe_cells`` — the same
    function the executor-side UDF calls, so the two probe forms cannot
    drift). The exploded (query_id, q_emb, cell) side re-enters Spark as a
    local relation; the only job that touches the layout is the pruned
    scan itself — no ``distinct().collect()`` probe job per batch.

    ``cent_unit=None`` (the r11 default) reads the codebook from the
    layout's own ``_ivf_meta.json`` sidecar — the self-describing
    contract the banded layout already has.

    Batches past ``_MAX_PROBE_BATCH_ROWS`` dispatch to the DISTRIBUTED
    branch (r11): executor-side probe math, shuffle join against the
    layout, no driver collect — identical results, pinned in
    tests/test_new_op_properties.py.
    """
    if cent_unit is None:
        cent_unit = read_ivf_codebook(spark, path)
    q_src = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_emb"),
    )
    # Dispatch peek on the ID COLUMN only (r11 self-review: peeking with
    # limit(cap+1) over the full rows shipped up to cap+1 embedding
    # arrays to the driver just to discard them on the distributed
    # branch — ~134 MB at 1024-dim). The count job is bounded and
    # column-pruned; the driver branch then collects the full rows it
    # actually needs (two small jobs for small batches — the trade for
    # never spiking the driver on large ones).
    cap = _MAX_PROBE_BATCH_ROWS if driver_batch_rows is None else driver_batch_rows
    n_peek = q_src.select("query_id").limit(cap + 1).count()
    if n_peek > cap:
        # Fact-scale batch: executor-side probe math (same probe_cells
        # via ivf_probe_udf), shuffle join against the full layout scan
        # (a batch this size probes ~every cell — static pruning is
        # moot), identical rerank tail. No driver collect of the batch.
        from nbi_oedi_etl_spark.operators.similarity import ivf_probe_udf

        q = q_src.select(
            "query_id",
            "q_emb",
            F.explode(ivf_probe_udf(cent_unit, n_probe)(F.col("q_emb"))).alias(
                "cell"
            ),
        )
        return _rerank_candidates(
            spark.read.parquet(path), q, k, broadcast_q=False
        )
    rows = q_src.collect()  # ≤ cap rows by the peek above
    if rows:
        mat = np.asarray([r["q_emb"] for r in rows], dtype=np.float64)
        cells = probe_cells(mat, cent_unit, n_probe)
    else:
        cells = np.empty((0, n_probe), dtype="int32")
    exploded = [
        (r["query_id"], r["q_emb"], int(cell))
        for r, row_cells in zip(rows, cells)
        for cell in row_cells
    ]
    # local relation with the query id's NATIVE type: reuse q_src's schema
    # and append the cell column — no type round-trip through strings
    from pyspark.sql.types import IntegerType, StructField, StructType

    q_schema = StructType(
        list(q_src.schema.fields) + [StructField("cell", IntegerType(), False)]
    )
    q = spark.createDataFrame(exploded, q_schema)
    # driver-side union of probed cells (≤ n_cells ints) — this is what
    # turns the probe into a STATIC partition predicate Catalyst can
    # prune the file listing with, before any IO
    probed_cells = sorted({int(c) for c in cells.ravel()})
    c = spark.read.parquet(path).where(F.col("cell").isin(probed_cells))
    return _rerank_candidates(c, q, k, broadcast_q=True)
