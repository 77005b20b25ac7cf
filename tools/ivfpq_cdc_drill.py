"""Long-CDC maintenance drill for the IVF-PQ compressed tier (VERDICT
r12 task 5 — banded has ``banded_cdc_drill.py``, packing has
``pack_cdc_drill.py``; this closes the triple).

Runs ``--batches`` N deterministic vector slices (``vec_id % N``)
through the shipped maintenance path — batch 0 via
``write_ivf_pq_layout`` (codebooks trained ONCE, fixed for layout
life), batches 1..N-1 via ``append_to_ivf_pq_layout`` (encode with the
STORED codebooks), ``compact_ivf_layout`` every ``COMPACT_EVERY``
appends — and measures the write/fragmentation trajectory plus probe
parity:

- ``bounded``: bytes written per append track the BATCH size (last/first
  within ``SLACK``×), not corpus-so-far; the rewrite control (full
  corpus-so-far re-encode per batch, the O(B²) anti-pattern swept out of
  the CDC streams in r12) grows ~linearly in batch count;
- ``file_bounded``: max parquet files per cell never exceeds
  ``MAX_FILES_PER_CELL + COMPACT_EVERY`` (worst case between
  maintenance runs) with compaction on cadence, while the uncompacted
  count would grow linearly;
- ``parity``: after 20 batches + compactions, an ADC probe over the
  incrementally-maintained layout returns EXACTLY the results of the
  same probe over a bulk twin (same sidecars, all vectors appended in
  one shot) — appends + compaction are invisible to queries. This also
  re-proves build-path vs append-path encode identity at 20-batch depth
  (both go through ``_pq_encode_codes``).

Usage:
    python tools/ivfpq_cdc_drill.py [--batches N] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SCALE_PROBE_SRC", "/root/testdata/sf0.1")
COMPACT_EVERY = 8
MAX_FILES_PER_CELL = 4
SLACK = 3.0  # batch sizes vary ± and parquet has per-file fixed overhead
N_CELLS, PQ_M, PQ_K = 16, 4, 16


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _max_files_per_cell(layout: str) -> int:
    worst = 0
    for d in os.listdir(layout):
        full = os.path.join(layout, d)
        if d.startswith("cell=") and os.path.isdir(full):
            worst = max(
                worst, len([f for f in os.listdir(full) if f.endswith(".parquet")])
            )
    return worst


def _copy_sidecars(src_layout: str, dest: str) -> None:
    from nbi_oedi_etl_spark.operators.ivf_layout import (
        _IVF_META_FILE,
        _IVF_PQ_META_FILE,
    )

    os.makedirs(dest, exist_ok=True)
    for f in (_IVF_META_FILE, _IVF_PQ_META_FILE):
        shutil.copy(os.path.join(src_layout, f), os.path.join(dest, f))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    n = args.batches

    from pyspark.sql import functions as F

    from nbi_oedi_etl_spark import get_spark
    from nbi_oedi_etl_spark.operators.ivf_layout import (
        append_to_ivf_pq_layout,
        compact_ivf_layout,
        probe_ivf_pq_layout,
        write_ivf_pq_layout,
    )

    spark = get_spark(app_name="ivfpq-cdc-drill")
    spark.sparkContext.setLogLevel("ERROR")

    vecs = (
        spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
            (F.col("vec_id") % n).alias("batch"),
        )
        .localCheckpoint(eager=True)
    )
    batch_rows = [
        int(r["c"])
        for r in vecs.groupBy("batch").agg(F.count(F.lit(1)).alias("c"))
        .orderBy("batch").collect()
    ]

    # ---- shipped path: initial build + per-batch appends + cadence compaction
    layout = tempfile.mkdtemp(prefix="ivfpq_drill_") + "/layout"
    t0 = time.monotonic()
    write_ivf_pq_layout(
        vecs.where(F.col("batch") == 0).drop("batch"),
        layout,
        n_cells=N_CELLS,
        pq_m=PQ_M,
        pq_k=PQ_K,
    )
    build_sec = round(time.monotonic() - t0, 3)
    append_bytes = [_dir_bytes(layout)]  # batch 0 = the build write
    append_secs = [build_sec]
    files_per_cell_traj = [_max_files_per_cell(layout)]
    compactions = []
    for k in range(1, n):
        before = _dir_bytes(layout)
        t0 = time.monotonic()
        append_to_ivf_pq_layout(
            spark, layout, vecs.where(F.col("batch") == k).drop("batch")
        )
        append_secs.append(round(time.monotonic() - t0, 3))
        append_bytes.append(_dir_bytes(layout) - before)
        if k % COMPACT_EVERY == 0:
            stats = compact_ivf_layout(
                spark, layout, max_files_per_cell=MAX_FILES_PER_CELL
            )
            compactions.append({"after_batch": k, **stats})
        files_per_cell_traj.append(_max_files_per_cell(layout))

    # ---- control: the O(B²) anti-pattern — re-encode corpus-so-far per
    # batch (same stored codebooks, same encode machinery, fresh dir so
    # each batch's write volume is the FULL history)
    ctrl_bytes, ctrl_secs = [], []
    for k in range(n):
        ctrl = tempfile.mkdtemp(prefix="ivfpq_drill_ctrl_") + "/layout"
        _copy_sidecars(layout, ctrl)
        so_far = vecs.where(F.col("batch") <= k).drop("batch")
        t0 = time.monotonic()
        append_to_ivf_pq_layout(spark, ctrl, so_far)
        ctrl_secs.append(round(time.monotonic() - t0, 3))
        ctrl_bytes.append(_dir_bytes(ctrl))
        shutil.rmtree(os.path.dirname(ctrl), ignore_errors=True)

    # ---- bulk twin: same sidecars, ALL vectors in one append ----
    twin = tempfile.mkdtemp(prefix="ivfpq_drill_twin_") + "/layout"
    _copy_sidecars(layout, twin)
    append_to_ivf_pq_layout(spark, twin, vecs.drop("batch"))

    queries = (
        vecs.where(F.col("vec_id") % 13 == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    n_queries = queries.count()

    def probe_set(path):
        return {
            (r["query_id"], r["vec_id"], r["rank"], round(r["cos_sim"], 9))
            for r in probe_ivf_pq_layout(
                spark, path, queries, k=10, n_probe=4
            ).collect()
        }

    got, want = probe_set(layout), probe_set(twin)
    parity = got == want

    total_rows = int(
        spark.read.parquet(layout).agg(F.count(F.lit(1)).alias("c")).collect()[0]["c"]
    )
    bounded = append_bytes[-1] <= SLACK * max(1, append_bytes[1])
    ctrl_ratio = ctrl_bytes[-1] / max(1, ctrl_bytes[0])
    file_bounded = max(files_per_cell_traj) <= MAX_FILES_PER_CELL + COMPACT_EVERY

    report = {
        "src": SRC,
        "batches": n,
        "compact_every": COMPACT_EVERY,
        "n_cells": N_CELLS,
        "pq_m": PQ_M,
        "pq_k": PQ_K,
        "batch_rows": batch_rows,
        "append_bytes_per_batch": append_bytes,
        "control_bytes_per_batch": ctrl_bytes,
        "append_last_over_first": round(
            append_bytes[-1] / max(1, append_bytes[1]), 3
        ),
        "control_last_over_first": round(ctrl_ratio, 3),
        "append_total_bytes": sum(append_bytes),
        "control_total_bytes": sum(ctrl_bytes),
        "write_amplification_control_over_append": round(
            sum(ctrl_bytes) / max(1, sum(append_bytes)), 3
        ),
        "append_secs": append_secs,
        "control_secs": ctrl_secs,
        "max_files_per_cell_trajectory": files_per_cell_traj,
        "compactions": compactions,
        "layout_rows": total_rows,
        "n_probe_queries": n_queries,
        "probe_result_rows": len(got),
        "bounded": bounded,
        "file_bounded": file_bounded,
        "parity": parity,
        "ok": bool(
            bounded and file_bounded and parity and ctrl_ratio > n / 4
        ),
    }
    print(json.dumps(report))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
    shutil.rmtree(os.path.dirname(layout), ignore_errors=True)
    shutil.rmtree(os.path.dirname(twin), ignore_errors=True)
    spark.stop()
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
