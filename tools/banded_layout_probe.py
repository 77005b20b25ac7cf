"""Scale probe for the at-rest LSH banding layout (r10 sibling of
``tools/ivf_layout_probe.py``).

``operators/banded_layout`` claims: materialize the corpus band rows
ONCE partitioned by bucketed band key, and every CDC probe reads only
the buckets its batch hashes into. This probe MEASURES that at 1x and
10x corpus (caesar-shift-replicated documents via
``scale_probe._replicate`` — intra-replica shingle structure preserved,
replicas decorrelated):

- **files-read vs files-total** from the FileSourceScan ``numFiles``
  metric: must equal the batch's probed-pcell count at BOTH scales
  (empty probed pcells have no directory, so files_read can only be
  LESS than the probed-pcell union — never more);
- **probe wall-time ratio** 10x/1x;
- the one-time layout write cost, reported separately (amortized).

The probe batch is the SAME ``N_BATCH`` replica-0 documents at both
scales, so the probed-pcell set is identical; only corpus size changes.

Usage:
    python tools/banded_layout_probe.py [--json OUT]
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

from ivf_layout_probe import _walk_scans  # noqa: E402
from scale_probe import _replicate  # noqa: E402

SRC = os.environ.get("SCALE_PROBE_SRC", "/root/testdata/sf0.1")
N_BUCKETS = 64  # bands(8) x 64 = 512 pcell partitions
N_BATCH = 4  # CDC batch: 4 docs -> at most 32 probed pcells of 512
FACTOR = 10


def _build_documents(factor: int) -> str:
    d = os.path.join(tempfile.gettempdir(), f"banded_probe_docs_{factor}x")
    out = os.path.join(d, "documents.parquet")
    if not os.path.exists(out):
        os.makedirs(d, exist_ok=True)
        base = pq.read_table(os.path.join(SRC, "documents.parquet"))
        reps = [_replicate(base, "documents.parquet", r) for r in range(factor)]
        pq.write_table(pa.concat_tables(reps), out)
    return out


def _scan_files_read(df, layout: str) -> int:
    scans: list = []
    _walk_scans(df._jdf.queryExecution().executedPlan(), scans)
    return sum(
        int(node.metrics().apply("numFiles").value())
        for node in scans
        if layout in node.toString()
    )


def main() -> int:
    global FACTOR
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--factor", type=int, default=FACTOR)
    args = ap.parse_args()
    FACTOR = args.factor

    from pyspark.sql import functions as F

    from nbi_oedi_etl_spark import get_spark
    from nbi_oedi_etl_spark.operators.banded_layout import (
        _pcell,
        probe_banded_layout,
        write_banded_layout,
    )
    from nbi_oedi_etl_spark.operators.dedup import band_rows

    spark = get_spark(app_name="banded-layout-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # identical CDC batch at both scales: N_BATCH replica-0 docs,
    # re-keyed so the corpus-side originals still count as candidates
    batch = (
        spark.read.parquet(os.path.join(SRC, "documents.parquet"))
        .orderBy("doc_id")
        .limit(N_BATCH)
        .select((F.col("doc_id") + 900_000_000).alias("doc_id"), "text")
        .localCheckpoint(eager=True)
    )
    expected_pcells = {
        r["pcell"]
        for r in band_rows(batch)
        .withColumn("pcell", _pcell(N_BUCKETS))
        .select("pcell")
        .distinct()
        .collect()
    }

    report: dict = {
        "n_buckets": N_BUCKETS,
        "n_batch_docs": N_BATCH,
        "factor": FACTOR,
        "source_sf_dir": SRC,
        "probed_pcell_union": len(expected_pcells),
    }
    for factor in (1, FACTOR):
        docs_path = _build_documents(factor)
        corpus = spark.read.parquet(docs_path).select("doc_id", "text")
        layout = os.path.join(
            tempfile.mkdtemp(prefix=f"banded_layout_{factor}x_"), "layout"
        )
        t0 = time.monotonic()
        write_banded_layout(corpus, layout, n_buckets=N_BUCKETS)
        write_sec = time.monotonic() - t0
        files_total = len(spark.read.parquet(layout).inputFiles())
        walls, rows, files_read = [], None, None
        for _ in range(3):
            t0 = time.monotonic()
            out = probe_banded_layout(spark, layout, batch)
            rows = len(out.collect())
            walls.append(time.monotonic() - t0)
            files_read = _scan_files_read(out, layout)
        key = f"{'one' if factor == 1 else 'ten'}_x"
        report[key] = {
            "corpus_rows": corpus.count(),
            "write_layout_sec": round(write_sec, 3),
            "files_total": files_total,
            "files_read": files_read,
            # <= because pcells with no corpus rows have no directory
            "read_within_probed": files_read <= len(expected_pcells),
            "files_fraction": round(files_read / files_total, 4),
            "probe_sec_median": round(sorted(walls)[1], 3),
            "probe_runs_sec": [round(w, 3) for w in walls],
            "result_rows": rows,
        }
    ratio = report["ten_x"]["probe_sec_median"] / report["one_x"]["probe_sec_median"]
    report["probe_ratio_10x_over_1x"] = round(ratio, 2)
    report["superlinear"] = ratio > FACTOR
    report["read_within_probed_both_scales"] = bool(
        report["one_x"]["read_within_probed"]
        and report["ten_x"]["read_within_probed"]
    )
    out = json.dumps(report, indent=1, sort_keys=True)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
