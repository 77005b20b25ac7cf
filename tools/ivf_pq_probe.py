"""At-rest IVF-PQ layout evidence: the BYTES story, measured.

Builds the IVF-PQ layout from the sf0.1 embeddings, then records the
three numbers that make the compressed tier worth shipping:

1. **column bytes at rest** — compressed parquet bytes of the embedding
   column vs the M code columns across the whole layout (pyarrow
   metadata; no scan). The ADC probe's ReadSchema carries only the code
   columns, so this ratio IS the probe's IO ratio on the probed cells.
2. **plan composition** — the executed probe plan must show BOTH
   prunings: PartitionFilters on the probed cells (which files) and a
   ReadSchema without the embedding column (which bytes of those files).
3. **parity** — the ADC probe's result equals an independent numpy
   reconstruction from the stored codes + sidecars
   (``ivf_layout.ivf_pq_reconstruction_reference`` — the same function
   tests/test_new_op_properties.py pins, run here at layout scale for a
   24-query batch).

Usage:
    python tools/ivf_pq_probe.py [--json SCALE_PROBE_IVFPQ.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

import pyarrow.parquet as papq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SCALE_PROBE_SRC", "/root/testdata/sf0.1")


def column_bytes(layout: str) -> dict[str, int]:
    sizes: dict[str, int] = {}
    for f in glob.glob(f"{layout}/cell=*/*.parquet"):
        md = papq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema.split(".")[0]
                sizes[name] = sizes.get(name, 0) + col.total_compressed_size
    return sizes


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="SCALE_PROBE_IVFPQ.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from nbi_oedi_etl_spark import get_spark
    from nbi_oedi_etl_spark.operators.ivf_layout import (
        ivf_pq_reconstruction_reference,
        probe_ivf_pq_layout,
        read_ivf_codebook,
        read_ivf_pq_meta,
        write_ivf_pq_layout,
    )

    spark = get_spark(app_name="ivf-pq-probe")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.read.parquet(f"{SRC}/embeddings.parquet")
    dest = os.path.join(tempfile.gettempdir(), "ivf_pq_layout_probe")
    import shutil

    shutil.rmtree(dest, ignore_errors=True)
    t0 = time.time()
    write_ivf_pq_layout(corpus, dest, n_cells=16, pq_m=4, pq_k=16)
    t_write = time.time() - t0

    sizes = column_bytes(dest)
    emb_b = sizes.get("emb", 0)
    code_b = sum(v for k, v in sizes.items() if k.startswith("code_"))

    q = corpus.where(F.col("vec_id") < 24).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t0 = time.time()
    got_df = probe_ivf_pq_layout(spark, dest, q, k=5, n_probe=4)
    got = {
        (r["query_id"], r["vec_id"], r["cos_sim"], r["rank"])
        for r in got_df.collect()
    }
    t_probe = time.time() - t0
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    readschema_pruned = bool(scan_lines) and all(
        "emb" not in ln.split("ReadSchema")[1] for ln in scan_lines
    )
    partition_pruned = "PartitionFilters: [" in plan and any(
        "cell" in ln for ln in plan.splitlines() if "PartitionFilters" in ln
    )

    cent = read_ivf_codebook(spark, dest)
    meta = read_ivf_pq_meta(spark, dest)
    qrows = [(r["query_id"], list(r["q_emb"])) for r in q.select(
        "query_id", F.col("embedding").cast("array<double>").alias("q_emb")
    ).collect()]
    want = ivf_pq_reconstruction_reference(dest, qrows, cent, meta, n_probe=4, k=5)
    parity = got == want

    out = {
        "src": SRC,
        "n_vectors": corpus.count(),
        "emb_column_bytes": emb_b,
        "code_columns_bytes": code_b,
        "bytes_ratio": round(code_b / emb_b, 4) if emb_b else None,
        "write_s": round(t_write, 3),
        "probe_s": round(t_probe, 3),
        "probe_rows": len(got),
        "partition_pruned": partition_pruned,
        "readschema_pruned": readschema_pruned,
        "parity": parity,
        "ok": parity and partition_pruned and readschema_pruned,
    }
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
