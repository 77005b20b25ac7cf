"""Scale probe for the IVF at-rest layout (VERDICT r9 task 2).

``operators/ivf_layout`` claims: materialize the corpus hive-partitioned
by coarse cell ONCE, and every later probe reads only n_probe/n_cells of
the files — a partition-pruned scan instead of a full pass. This probe
MEASURES that claim at 1x and 10x corpus size:

- **files-read vs files-total** from the FileSourceScan's ``numFiles``
  SQL metric (the key evidence: the pruned fraction must equal the
  probed-cell union / n_cells at BOTH scales — corpus growth must not
  change WHICH fraction of the layout a probe touches);
- **probe wall-time ratio** 10x/1x (sub-linear at this scale: the probe
  reads 10x more bytes only inside its probed cells, and fixed overhead
  dominates at sf0.1 — a ratio near the file-fraction-scaled volume, not
  near a full-scan 10x);
- the **one-time layout write** cost at each scale, reported separately
  because it amortizes over every later probe batch.

The 10x corpus reuses ``scale_probe._replicate`` (vec_id offset +
deterministic per-replica coordinate permutation — norms and
intra-replica cosines preserved, replicas decorrelated). The query batch
is the SAME ``N_QUERIES`` replica-0 vectors at both scales.

Usage:
    python tools/ivf_layout_probe.py [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_probe import _replicate  # noqa: E402

SRC = os.environ.get("SCALE_PROBE_SRC", "/root/testdata/sf0.1")
# 100 TB-realistic proportions: the probed union (<= N_QUERIES * N_PROBE)
# must be a small fraction of N_CELLS for pruning to mean anything — at
# real scale n_cells is in the thousands and a batch touches a sliver.
N_CELLS = 128
N_PROBE = 4
N_QUERIES = 8
FACTOR = 10


def _build_embeddings(factor: int) -> str:
    d = os.path.join(tempfile.gettempdir(), f"ivf_probe_emb_{factor}x")
    out = os.path.join(d, "embeddings.parquet")
    if not os.path.exists(out):
        os.makedirs(d, exist_ok=True)
        base = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
        reps = [_replicate(base, "embeddings.parquet", r) for r in range(factor)]
        pq.write_table(pa.concat_tables(reps), out)
    return out


def _walk_scans(node, out) -> None:
    """Recursive physical-plan walk that descends through AQE wrappers
    (AdaptiveSparkPlanExec / QueryStageExec hold their subtree in
    ``executedPlan()`` / ``plan()``, NOT in ``children()``) and collects
    every FileSourceScan node."""
    cls = node.getClass().getName()
    if "FileSourceScan" in cls:
        out.append(node)
        return
    if "AdaptiveSparkPlan" in cls:
        _walk_scans(node.executedPlan(), out)
        return
    if "QueryStageExec" in cls:
        _walk_scans(node.plan(), out)
        return
    kids = node.children()
    for i in range(kids.size()):
        _walk_scans(kids.apply(i), out)


def _scan_files_read(df, layout: str) -> int:
    """Sum of the LAYOUT scan's ``numFiles`` metrics after df's own
    action — the number of layout files the probe actually listed and
    read (the local-relation query side has no file scan)."""
    scans: list = []
    _walk_scans(df._jdf.queryExecution().executedPlan(), scans)
    total = 0
    for node in scans:
        if layout in node.toString():
            total += int(node.metrics().apply("numFiles").value())
    return total


def _probe_once(spark, layout, queries_df, cent):
    from nbi_oedi_etl_spark.operators.ivf_layout import probe_ivf_layout

    t0 = time.monotonic()
    out = probe_ivf_layout(
        spark, layout, queries_df, cent, k=10, n_probe=N_PROBE
    )
    rows = out.collect()
    wall = time.monotonic() - t0
    return wall, len(rows), _scan_files_read(out, layout)


def main() -> int:
    global FACTOR
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--factor", type=int, default=FACTOR)
    args = ap.parse_args()
    FACTOR = args.factor

    from pyspark.sql import functions as F

    from nbi_oedi_etl_spark import get_spark
    from nbi_oedi_etl_spark.operators.ivf_layout import write_ivf_layout

    spark = get_spark(app_name="ivf-layout-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # identical query batch at both scales: 16 replica-0 vectors
    qbatch = (
        spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
        .orderBy("vec_id")
        .limit(N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .localCheckpoint(eager=True)
    )

    report: dict = {
        "n_cells": N_CELLS,
        "n_probe": N_PROBE,
        "n_queries": N_QUERIES,
        "factor": FACTOR,
        "source_sf_dir": SRC,
    }
    for factor in (1, FACTOR):
        emb_path = _build_embeddings(factor)
        corpus = spark.read.parquet(emb_path)
        layout = os.path.join(
            tempfile.mkdtemp(prefix=f"ivf_layout_{factor}x_"), "layout"
        )
        t0 = time.monotonic()
        cent = write_ivf_layout(corpus, layout, n_cells=N_CELLS)
        write_sec = time.monotonic() - t0
        files_total = len(spark.read.parquet(layout).inputFiles())
        walls, rows, files_read = [], None, None
        for _ in range(3):
            wall, rows, files_read = _probe_once(spark, layout, qbatch, cent)
            walls.append(wall)
        # the probed-cell union this batch implies, recomputed with the
        # same shared math the probe itself uses — files_read must equal
        # it EXACTLY (the scan listed only the probed partitions)
        import numpy as np

        from nbi_oedi_etl_spark.operators.similarity import probe_cells

        qmat = np.asarray(
            [r["embedding"] for r in qbatch.collect()], dtype=np.float64
        )
        probed_union = {int(c) for c in probe_cells(qmat, cent, N_PROBE).ravel()}
        key = f"{'one' if factor == 1 else 'ten'}_x"
        report[key] = {
            "corpus_rows": corpus.count(),
            "write_layout_sec": round(write_sec, 3),
            "files_total": files_total,
            "files_read": files_read,
            "probed_cell_union": len(probed_union),
            "read_exactly_probed": files_read == len(probed_union),
            "files_fraction": round(files_read / files_total, 4),
            "probe_sec_median": round(sorted(walls)[1], 3),
            "probe_runs_sec": [round(w, 3) for w in walls],
            "result_rows": rows,
        }
    ratio = report["ten_x"]["probe_sec_median"] / report["one_x"]["probe_sec_median"]
    report["probe_ratio_10x_over_1x"] = round(ratio, 2)
    report["superlinear"] = ratio > FACTOR
    # the headline claim: the probe reads EXACTLY its probed-cell union
    # of the layout files at both scales — corpus growth changes file
    # SIZE inside probed cells, never WHICH fraction of files is read
    report["read_exactly_probed_both_scales"] = bool(
        report["one_x"]["read_exactly_probed"]
        and report["ten_x"]["read_exactly_probed"]
    )
    out = json.dumps(report, indent=1, sort_keys=True)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
