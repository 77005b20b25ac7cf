"""Hot-source probe for the packing/budget cumsum family (VERDICT r10
tasks 2+4): one source holding 90% of all documents is exactly the
regime where the naive ``Window.partitionBy(source)`` cumsum serializes
on one task. This probe measures, at two scales, the three forms the
``skew.keyed_cumsum`` front door arbitrates between:

- ``naive``  — single keyed window (one task per source);
- ``spine``  — the generalized two-pass (doc_id-range buckets);
- ``dispatch`` — the front door itself (must pick naive below the
  measured ~1M rows/key crossover and spine at/above it).

The corpus is SYNTHESIZED (spark.range → doc_id, 90%-hot source, token
counts) rather than replicated from testdata: the packing cumsum's cost
at scale is the WINDOW machinery, not tokenization, and testdata tops
out far below the crossover. Value equality naive-vs-spine is checked
at both scales via full-frame checksums.

Pass criteria:
- checksums equal at both scales, both bucketizer families;
- dispatch picks naive at the small scale and spine at the large one;
- at the large scale the spine's wall is <= the naive's (the hot
  source no longer serializes the stage); the naive's growth ratio
  exceeds the spine's (sub-linear relative growth for the dispatched
  form).

Usage:
    python tools/packing_skew_probe.py [--small N] [--large N] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_FRAC_MOD = 10  # doc_id % 10 != 0 -> "hot" source: 90% of rows


def _timed(fn, runs: int = 3) -> float:
    walls = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        walls.append(time.monotonic() - t0)
    return sorted(walls)[runs // 2]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=300_000)
    ap.add_argument("--large", type=int, default=3_000_000)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from nbi_oedi_etl_spark import get_spark
    from nbi_oedi_etl_spark.operators import skew
    from nbi_oedi_etl_spark.workload_ext34 import (
        PACK_BUCKET_DOCS,
        _doc_id_bucket,
        _hash_prefix_bucket,
    )

    spark = get_spark(app_name="packing-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    report: dict = {
        "hot_frac": 1.0 - 1.0 / HOT_FRAC_MOD,
        "crossover_rows_per_key": skew.SPINE_CROSSOVER_ROWS_PER_KEY,
        "pack_bucket_docs": PACK_BUCKET_DOCS,
        "scales": {},
    }

    def corpus(n: int):
        return (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                F.when(F.col("id") % HOT_FRAC_MOD != 0, F.lit("hot"))
                .otherwise(F.concat(F.lit("cold"), (F.col("id") % 7).cast("string")))
                .alias("source"),
                (F.col("id") % 97 + 1).alias("n_tokens"),
                F.md5(F.col("id").cast("string")).alias("h"),
            )
            .localCheckpoint(eager=True)
        )

    def checksum(df):
        return tuple(
            df.agg(
                F.count(F.lit(1)).alias("n"),
                F.avg(F.col("c")).alias("m"),
                F.max(F.col("c")).alias("x"),
            ).first()
        )

    for label, n in (("small", args.small), ("large", args.large)):
        d = corpus(n)
        hot_rows = d.where(F.col("source") == "hot").count()
        entry: dict = {"rows": n, "hot_source_rows": hot_rows}

        # --- doc_id-order family (corpus_pack_sequences' shape) ---
        naive_df = skew.naive_keyed_cumsum(
            d, "source", ["doc_id"], "n_tokens", out_col="c", include_current=False
        )
        spine_df = skew.keyed_cumsum_two_pass(
            d, "source", ["doc_id"], _doc_id_bucket(), "n_tokens",
            out_col="c", include_current=False,
        )
        cs_naive, cs_spine = checksum(naive_df), checksum(spine_df)
        entry["doc_order_values_equal"] = cs_naive == cs_spine
        entry["naive_sec"] = round(_timed(lambda: checksum(naive_df)), 3)
        entry["spine_sec"] = round(_timed(lambda: checksum(spine_df)), 3)

        # --- hash-order family (source_token_budget_cap's shape) ---
        naive_h = skew.naive_keyed_cumsum(
            d, "source", ["h", "doc_id"], "n_tokens", out_col="c",
            include_current=False,
        )
        spine_h = skew.keyed_cumsum_two_pass(
            d, "source", ["h", "doc_id"], _hash_prefix_bucket("h"), "n_tokens",
            out_col="c", include_current=False,
        )
        entry["hash_order_values_equal"] = checksum(naive_h) == checksum(spine_h)
        entry["naive_hash_sec"] = round(_timed(lambda: checksum(naive_h)), 3)
        entry["spine_hash_sec"] = round(_timed(lambda: checksum(spine_h)), 3)

        # --- the front door's actual decision at this scale ---
        disp = skew.keyed_cumsum(
            d, "source", ["doc_id"], _doc_id_bucket(), "n_tokens",
            out_col="c", include_current=False,
        )
        plan = disp._jdf.queryExecution().executedPlan().toString()
        entry["dispatch_branch"] = "spine" if "__bucket" in plan else "naive"
        entry["dispatch_expected"] = (
            "spine" if hot_rows >= skew.SPINE_CROSSOVER_ROWS_PER_KEY else "naive"
        )
        report["scales"][label] = entry

    s, l = report["scales"]["small"], report["scales"]["large"]
    growth = args.large / args.small
    report["volume_factor"] = growth
    report["naive_growth_ratio"] = round(l["naive_sec"] / s["naive_sec"], 2)
    report["spine_growth_ratio"] = round(l["spine_sec"] / s["spine_sec"], 2)
    report["spine_vs_naive_at_large"] = round(l["spine_sec"] / l["naive_sec"], 2)
    report["ok"] = bool(
        s["doc_order_values_equal"]
        and l["doc_order_values_equal"]
        and s["hash_order_values_equal"]
        and l["hash_order_values_equal"]
        and s["dispatch_branch"] == s["dispatch_expected"]
        and l["dispatch_branch"] == l["dispatch_expected"]
        and l["spine_sec"] <= l["naive_sec"] * 1.1  # noise guard
        and report["spine_growth_ratio"] <= report["naive_growth_ratio"]
    )

    out = json.dumps(report, indent=1, sort_keys=True)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out + "\n")
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
