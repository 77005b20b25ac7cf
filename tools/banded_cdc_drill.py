"""Long-CDC drill for the at-rest banded layout (VERDICT r10 task 6).

The append path writes one file per touched pcell per batch, so a
long-running CDC stream fragments the layout linearly in batch count.
This drill runs ~20 probe→append batches and measures the file-count
trajectory with and without the in-tree maintenance
(``operators.banded_layout.compact_banded_layout`` every
``COMPACT_EVERY`` batches), then checks PROBE PARITY: a fixed query
batch must return identical candidate pairs against the fragmented and
the compacted layout.

Pass criteria (recorded in the JSON report):
- ``bounded``: with compaction on the stated cadence, the max
  files-per-pcell never exceeds ``max_files_per_pcell + COMPACT_EVERY``
  (the worst case between maintenance runs), while the uncompacted
  control grows linearly in batch count;
- ``probe_parity``: identical pairs fragmented vs compacted.

Usage:
    python tools/banded_cdc_drill.py [--batches N] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SCALE_PROBE_SRC", "/root/testdata/sf0.1")
N_BUCKETS = 64  # bands(8) x 64 = 512 pcells
COMPACT_EVERY = 8
MAX_FILES_PER_PCELL = 4


def _pcell_file_counts(layout: str) -> dict[str, int]:
    out = {}
    for d in os.listdir(layout):
        full = os.path.join(layout, d)
        if d.startswith("pcell=") and os.path.isdir(full):
            out[d] = len([f for f in os.listdir(full) if f.endswith(".parquet")])
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    n_batches = args.batches

    from pyspark.sql import functions as F

    from nbi_oedi_etl_spark import get_spark
    from nbi_oedi_etl_spark.operators.banded_layout import (
        append_to_banded_layout,
        compact_banded_layout,
        probe_banded_layout,
        write_banded_layout,
    )

    spark = get_spark(app_name="banded-cdc-drill")
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        spark.read.parquet(os.path.join(SRC, "documents.parquet"))
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    mod = n_batches + 1  # slice 0 = initial corpus, slices 1..N = batches
    query_batch = (
        docs.orderBy("doc_id")
        .limit(4)
        .select((F.col("doc_id") + 900_000_000).alias("doc_id"), "text")
        .localCheckpoint(eager=True)
    )

    report: dict = {
        "source_sf_dir": SRC,
        "n_batches": n_batches,
        "n_buckets": N_BUCKETS,
        "compact_every": COMPACT_EVERY,
        "max_files_per_pcell": MAX_FILES_PER_PCELL,
    }

    trajectories: dict[str, list[dict]] = {}
    layouts: dict[str, str] = {}
    for variant in ("uncompacted", "compacted"):
        layout = os.path.join(
            tempfile.mkdtemp(prefix=f"banded_drill_{variant}_"), "layout"
        )
        layouts[variant] = layout
        write_banded_layout(
            docs.where(F.col("doc_id") % mod == 0), layout, n_buckets=N_BUCKETS
        )
        traj: list[dict] = []
        compactions: list[dict] = []
        t0 = time.monotonic()
        for k in range(1, n_batches + 1):
            batch = docs.where(F.col("doc_id") % mod == k)
            probe_banded_layout(spark, layout, batch).count()  # the CDC probe leg
            append_to_banded_layout(spark, layout, batch)
            if variant == "compacted" and k % COMPACT_EVERY == 0:
                done = compact_banded_layout(
                    spark, layout, max_files_per_pcell=MAX_FILES_PER_PCELL
                )
                compactions.append(
                    {
                        "after_batch": k,
                        "dirs_compacted": len(done),
                        "max_before": max((b for b, _ in done.values()), default=0),
                        "max_after": max((a for _, a in done.values()), default=0),
                    }
                )
            counts = _pcell_file_counts(layout)
            traj.append(
                {
                    "batch": k,
                    "total_files": sum(counts.values()),
                    "max_files_per_pcell": max(counts.values(), default=0),
                    "n_pcells": len(counts),
                }
            )
        trajectories[variant] = traj
        report[variant] = {
            "wall_sec": round(time.monotonic() - t0, 2),
            "trajectory": traj,
            "final_total_files": traj[-1]["total_files"],
            "final_max_files_per_pcell": traj[-1]["max_files_per_pcell"],
        }
        if variant == "compacted":
            report[variant]["compactions"] = compactions

    # one final maintenance pass on the compacted variant, then parity
    final = compact_banded_layout(
        spark, layouts["compacted"], max_files_per_pcell=MAX_FILES_PER_PCELL
    )
    report["final_compaction_dirs"] = len(final)
    counts = _pcell_file_counts(layouts["compacted"])
    report["compacted_final_after_maintenance"] = {
        "total_files": sum(counts.values()),
        "max_files_per_pcell": max(counts.values(), default=0),
    }

    pairs_frag = sorted(
        map(tuple, probe_banded_layout(spark, layouts["uncompacted"], query_batch).collect())
    )
    pairs_comp = sorted(
        map(tuple, probe_banded_layout(spark, layouts["compacted"], query_batch).collect())
    )
    report["probe_result_rows"] = len(pairs_comp)
    report["probe_parity"] = pairs_frag == pairs_comp

    # bounded: between maintenance runs at most COMPACT_EVERY appends
    # stack on top of a freshly-compacted pcell
    bound = MAX_FILES_PER_PCELL + COMPACT_EVERY
    report["bound_files_per_pcell"] = bound
    report["bounded"] = all(
        t["max_files_per_pcell"] <= bound for t in trajectories["compacted"]
    )
    report["uncompacted_grows_linearly"] = (
        trajectories["uncompacted"][-1]["max_files_per_pcell"]
        > trajectories["compacted"][-1]["max_files_per_pcell"]
    )
    report["ok"] = bool(report["bounded"] and report["probe_parity"])

    out = json.dumps(report, indent=1, sort_keys=True)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out + "\n")
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
