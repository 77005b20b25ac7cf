"""Empirical skew probe: measure how the engine behaves when a key
distribution is pathologically hot, complementing tools/scale_probe.py
(which measures volume growth with healthy distributions).

Builds skewed twins of sf0.1 with IDENTICAL row counts — only the key
distributions change, at a configurable hot fraction (r7 verdict task 4
asks for 0.3 AND 0.6/0.9):

- ``lineitem``: ``frac`` of rows reassigned to ONE l_partkey (hot-product
  join/agg skew against the part dimension);
- ``events``: ``frac`` of rows reassigned to ONE user_id (hot-entity skew
  for keyed windows, sessionization, per-user aggregates).

Each probed query runs on base sf0.1 and on each skewed twin; the ratio
isolates the cost of skew at constant volume. What the postures in
SCALE.md predict, and this probe checks:

- groupBy-heavy shapes stay ~flat: partial (map-side) aggregation
  absorbs a hot grouping key before the shuffle, so one hot key adds
  map-combine work but no reducer hotspot;
- equi-joins stay ~flat: AQE splits skewed shuffle partitions
  (spark.sql.adaptive.skewJoin) or the dim side is broadcast;
- keyed WINDOW / sessionization shapes are the honest exception: one
  partition key must be processed by one task, so a ``frac``-hot entity
  serializes ``frac`` of that stage. The LOAD-IMBALANCE BOUND for the
  stage is ``t_skew/t_base <= frac*P`` (P = effective parallelism, 32
  here): the hot task does ``frac`` of the stage's rows that base
  spread over P tasks. A full-query ratio above that is SUPER-SHARE —
  algorithmic degradation (quadratic state, reducer collapse), not mere
  imbalance — and is what this probe flags for the two-pass-spine
  mitigation documented in SCALE.md. Sub-bound imbalance is reported,
  not hidden.

Flag rule per query: ratio > max(BASE_THRESHOLD, frac*P) for the window
class; ratio > BASE_THRESHOLD for everything else (generous against
shared-host noise; a quadratic collapse shows up as 10x+).

GROW MODE (``--mode grow``, r8 session-2): the constant-volume design
above collapses the key space, so per-group overheads SHRINK with frac
and measured ratios fall — honest but weak evidence for the hot-entity
cost model. Grow mode instead APPENDS rows for one hot ``events.user_id``
(cycling real rows so timestamps/values stay realistic, key overwritten)
until the hot user holds ``frac`` of the new total; every other key
keeps its original volume. Volume factor vf = 1/(1-frac). Bounds scale
with the volume actually added:

- window class: ``frac*vf*P`` — the hot key's ``frac*vf*N`` rows on one
  task vs base's ``N/P`` per task; exceeding it is super-share
  (quadratic state), the mitigation trigger;
- everything else: ``BASE_THRESHOLD*vf`` (linear volume growth).

Grow mode only skews events/user_id: growing a hot ``l_partkey``
inflates pair-join OUTPUT quadratically by construction (co-purchase
pairs, golden-record candidates), which measures output size, not
engine behavior — the lineitem-hot queries stay covered by constant
mode.

Usage:
    python tools/skew_probe.py [--json OUT] [--fractions 0.3 0.6 0.9]
                               [--queries name...] [--mode constant|grow]
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
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SKEW_PROBE_SRC", "/root/testdata/sf0.1")
BASE_THRESHOLD = 3.0
PARALLELISM = 32

# (query, why it is skew-relevant)
DEFAULT_QUERIES = [
    "pricing_summary",  # control: no hot key touches it (groupBy flags)
    "customer_order_counts",  # join + grouped agg
    "ref_q2_grouped_count_distinct",  # grouped COUNT(DISTINCT) on events
    "daily_active_wau",  # per-day distinct users: hot user collapses map-side
    "scd2_user_state_history",  # user-keyed windows: the honest hot spot
    "max_concurrent_sessions_daily",  # user-keyed sessionization
    "session_window_stats",  # gap-based sessionization over user_id
    "user_event_sequences",  # per-user ordered collect
    "part_golden_records",  # part-keyed survivorship over lineitem
    "copurchase_kcore",  # hot part inflates co-purchase pair counts
]

#: Queries whose core stage is a per-key window/sort: the honest
#: load-imbalance class, held to the frac*P bound instead of 3x.
WINDOW_CLASS = {
    "scd2_user_state_history",
    "max_concurrent_sessions_daily",
    "session_window_stats",
    "user_event_sequences",
}


def _skew_column(t: pa.Table, col: str, frac: float) -> pa.Table:
    """Reassign ~frac of rows (deterministically, by row index) to the
    column's first value, preserving type and row count."""
    i = t.schema.get_field_index(col)
    typ = t.schema.field(col).type
    values = t.column(col).to_pylist()
    hot = values[0]
    cut = int(round(frac * 100))  # j % 100 < cut -> exactly frac of rows
    skewed = [hot if j % 100 < cut else v for j, v in enumerate(values)]
    return t.set_column(i, t.schema.field(col), pa.array(skewed, type=typ))


#: Grow-mode default: the event/user queries (the hot-ENTITY family) plus
#: two controls that never read events.
GROW_QUERIES = [
    "pricing_summary",  # control: lineitem only, untouched in grow mode
    "customer_order_counts",  # control: orders x customer, untouched
    "ref_q2_grouped_count_distinct",
    "daily_active_wau",
    "scd2_user_state_history",
    "max_concurrent_sessions_daily",
    "session_window_stats",
    "user_event_sequences",
    # r9: the registered two-pass-spine specs. Deliberately NOT in
    # WINDOW_CLASS — the whole claim is that they do NOT need the
    # frac*P imbalance allowance: they are held to the tight
    # BASE_THRESHOLD*vf (linear-volume) bound on the same hot-entity
    # corpus that pushes the naive window class to its frac*vf*P bound.
    "spine_user_sessions",
    "spine_running_value_sum",
    "spine_event_rank",
]


def _grow_hot(t: pa.Table, col: str, frac: float) -> pa.Table:
    """Append copies of real rows (cycled, key overwritten to the first
    value) until the hot key holds ~frac of the new total. Other keys
    keep their exact original volume."""
    import math

    n = t.num_rows
    n_extra = math.ceil(frac * n / (1.0 - frac))
    idx = pa.array([j % n for j in range(n_extra)], type=pa.int64())
    extra = t.take(idx)
    i = t.schema.get_field_index(col)
    field = t.schema.field(col)
    hot = t.column(col).to_pylist()[0]
    extra = extra.set_column(i, field, pa.array([hot] * n_extra, type=field.type))
    return pa.concat_tables([t, extra]).combine_chunks()


def build_grown(frac: float) -> str:
    d = os.path.join(
        tempfile.gettempdir(), f"skew_probe_grow_corpus_{int(round(frac * 100))}"
    )
    marker = os.path.join(d, ".complete")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    for p in sorted(glob.glob(SRC + "/*.parquet")):
        name = os.path.basename(p)
        t = pq.read_table(p)
        if name == "events.parquet":
            t = _grow_hot(t, "user_id", frac)
        pq.write_table(t, os.path.join(d, name))
    with open(marker, "w") as f:
        f.write("ok")
    return d


def build_skewed(frac: float) -> str:
    # int(round(...)) matches _skew_column's cut exactly — plain int()
    # truncates (0.29*100 -> 28) and nearby fractions would collide on
    # the same cached corpus
    d = os.path.join(
        tempfile.gettempdir(), f"skew_probe_corpus_{int(round(frac * 100))}"
    )
    marker = os.path.join(d, ".complete")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    for p in sorted(glob.glob(SRC + "/*.parquet")):
        name = os.path.basename(p)
        t = pq.read_table(p)
        if name == "lineitem.parquet":
            t = _skew_column(t, "l_partkey", frac)
        elif name == "events.parquet":
            t = _skew_column(t, "user_id", frac)
        pq.write_table(t, os.path.join(d, name))
    with open(marker, "w") as f:
        f.write("ok")
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="SKEW_PROBE.json")
    ap.add_argument("--fractions", nargs="*", type=float, default=[0.3, 0.6, 0.9])
    ap.add_argument("--queries", nargs="*")
    ap.add_argument("--mode", choices=("constant", "grow"), default="constant")
    args = ap.parse_args()

    from nbi_oedi_etl_spark import get_spark, workload

    grow = args.mode == "grow"
    if grow and args.json == "SKEW_PROBE.json":
        args.json = "SKEW_PROBE_GROW.json"  # don't clobber constant-mode results
    names = args.queries or (GROW_QUERIES if grow else DEFAULT_QUERIES)
    spark = get_spark(app_name="skew_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = workload.queries()
    qs["pricing_summary"](spark, SRC).collect()  # warm the JVM

    # base timings once, shared across fractions. Each query runs twice
    # and the SECOND run is timed: the first pays per-query plan/codegen
    # warm-up that the skewed runs (same plans, warm session) never pay —
    # with a cold base, untouched control queries measured at 0.5x and
    # every ratio was biased low.
    base: dict[str, tuple[float, int]] = {}
    for n in names:
        qs[n](spark, SRC).collect()
        t0 = time.perf_counter()
        rows = len(qs[n](spark, SRC).collect())
        base[n] = (time.perf_counter() - t0, rows)

    runs: dict[str, dict] = {}
    all_flagged: list[str] = []
    for frac in args.fractions:
        skewed = build_grown(frac) if grow else build_skewed(frac)
        vf = 1.0 / (1.0 - frac) if grow else 1.0
        results: dict[str, dict] = {}
        for n in names:
            t_base, rows_base = base[n]
            t0 = time.perf_counter()
            rows_skew = len(qs[n](spark, skewed).collect())
            t_skew = time.perf_counter() - t0
            ratio = t_skew / t_base if t_base > 0 else float("inf")
            bound = (
                max(BASE_THRESHOLD, frac * vf * PARALLELISM)
                if n in WINDOW_CLASS
                else BASE_THRESHOLD * vf
            )
            results[n] = {
                "t_base_sec": round(t_base, 3),
                "t_skewed_sec": round(t_skew, 3),
                "ratio": round(ratio, 2),
                "bound": round(bound, 1),
                "rows_base": rows_base,
                "rows_skewed": rows_skew,
                "flagged": bool(ratio > bound),
            }
            print(
                f"[{frac}] {n}: base={t_base:.2f}s skewed={t_skew:.2f}s "
                f"ratio={ratio:.2f} bound={bound:.1f}"
                + ("  ** FLAGGED **" if results[n]["flagged"] else "")
            )
        flagged = [n for n, r in results.items() if r["flagged"]]
        all_flagged += [f"{n}@{frac}" for n in flagged]
        runs[str(frac)] = {"queries": results, "flagged": flagged}

    out = {
        "source_sf_dir": SRC,
        "mode": args.mode,
        "parallelism": PARALLELISM,
        "base_threshold": BASE_THRESHOLD,
        "window_class": sorted(WINDOW_CLASS),
        "runs": runs,
        "flagged": all_flagged,
    }
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {args.json}; flagged: {all_flagged}")
    return 1 if all_flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
