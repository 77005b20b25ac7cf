"""Empirical skew probe: measure how the engine behaves when a key
distribution is pathologically hot, complementing tools/scale_probe.py
(which measures volume growth with healthy distributions).

Builds a skewed twin of sf0.1 with IDENTICAL row counts — only the key
distributions change:

- ``lineitem``: 30% of rows reassigned to ONE l_partkey (hot-product
  join/agg skew against the part dimension);
- ``events``: 30% of rows reassigned to ONE user_id (hot-entity skew
  for keyed windows, sessionization, per-user aggregates).

Each probed query runs on base sf0.1 and on the skewed twin; the ratio
isolates the cost of skew at constant volume. What the postures in
SCALE.md predict, and this probe checks:

- groupBy-heavy shapes stay ~flat: partial (map-side) aggregation
  absorbs a hot grouping key before the shuffle, so one hot key adds
  map-combine work but no reducer hotspot;
- equi-joins stay ~flat: AQE splits skewed shuffle partitions
  (spark.sql.adaptive.skewJoin) or the dim side is broadcast;
- keyed WINDOW functions are the honest exception: one partition key
  must be sorted by one task, so a 30%-hot entity concentrates ~30% of
  the sort on one core. The probe reports it rather than hiding it —
  the mitigation at corpus scale is the two-pass spine documented in
  SCALE.md, not a silent cap.

A ratio above THRESHOLD (default 3.0 — generous against shared-host
noise; a quadratic or single-reducer collapse shows up as 10x+) flags
the query.

Usage:
    python tools/skew_probe.py [--json OUT] [--queries name...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SKEW_PROBE_SRC", "/root/testdata/sf0.1")
HOT_FRACTION = 0.3

# (query, why it is skew-relevant)
DEFAULT_QUERIES = [
    "pricing_summary",  # control: no hot key touches it (groupBy flags)
    "customer_order_counts",  # join + grouped agg
    "ref_q2_grouped_count_distinct",  # grouped COUNT(DISTINCT) on events
    "daily_active_wau",  # per-day distinct users: hot user collapses map-side
    "scd2_user_state_history",  # user-keyed windows: the honest hot spot
    "max_concurrent_sessions_daily",  # user-keyed sessionization
    "part_golden_records",  # part-keyed survivorship over lineitem
    "copurchase_kcore",  # hot part inflates co-purchase pair counts
]


def _skew_column(t: pa.Table, col: str) -> pa.Table:
    """Reassign ~HOT_FRACTION of rows (deterministically, by row index)
    to the column's first value, preserving type and row count."""
    i = t.schema.get_field_index(col)
    typ = t.schema.field(col).type
    values = t.column(col).to_pylist()
    hot = values[0]
    cut = int(HOT_FRACTION * 10)  # j % 10 < 3 -> exactly 30% of rows
    skewed = [hot if j % 10 < cut else v for j, v in enumerate(values)]
    return t.set_column(i, t.schema.field(col), pa.array(skewed, type=typ))


def build_skewed() -> str:
    d = os.path.join(tempfile.gettempdir(), "skew_probe_corpus")
    marker = os.path.join(d, ".complete")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    for p in sorted(glob.glob(SRC + "/*.parquet")):
        name = os.path.basename(p)
        t = pq.read_table(p)
        if name == "lineitem.parquet":
            t = _skew_column(t, "l_partkey")
        elif name == "events.parquet":
            t = _skew_column(t, "user_id")
        pq.write_table(t, os.path.join(d, name))
    with open(marker, "w") as f:
        f.write("ok")
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="SKEW_PROBE.json")
    ap.add_argument("--threshold", type=float, default=3.0)
    ap.add_argument("--queries", nargs="*")
    args = ap.parse_args()

    from nbi_oedi_etl_spark import get_spark, workload

    names = args.queries or DEFAULT_QUERIES
    skewed = build_skewed()
    spark = get_spark(app_name="skew_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = workload.queries()
    qs["pricing_summary"](spark, SRC).collect()  # warm the JVM

    results: dict[str, dict] = {}
    for n in names:
        fn = qs[n]
        t0 = time.perf_counter()
        rows_base = len(fn(spark, SRC).collect())
        t_base = time.perf_counter() - t0
        t0 = time.perf_counter()
        rows_skew = len(fn(spark, skewed).collect())
        t_skew = time.perf_counter() - t0
        ratio = t_skew / t_base if t_base > 0 else float("inf")
        results[n] = {
            "t_base_sec": round(t_base, 3),
            "t_skewed_sec": round(t_skew, 3),
            "ratio": round(ratio, 2),
            "rows_base": rows_base,
            "rows_skewed": rows_skew,
            "flagged": bool(ratio > args.threshold),
        }
        print(
            f"{n}: base={t_base:.2f}s skewed={t_skew:.2f}s ratio={ratio:.2f}"
            + ("  ** FLAGGED **" if results[n]["flagged"] else "")
        )

    out = {
        "hot_fraction": HOT_FRACTION,
        "source_sf_dir": SRC,
        "queries": results,
        "flagged": [n for n, r in results.items() if r["flagged"]],
    }
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {args.json}; flagged: {out['flagged']}")
    return 1 if out["flagged"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
