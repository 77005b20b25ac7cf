"""Bench regression guard: every headline query must stay summary-sized
and inside a generous per-query wall budget at sf0.01.

Motivation (round 2 post-mortem): `part_name_fuzzy_pairs`' blocking key
was degenerate on this data — at sf0.01 the oracle matched in
milliseconds while sf0.1 materialized 25M pairs and burned 332 s (81% of
the bench). Wall-clock at small SF cannot catch an O(n²) pair explosion,
but the OUTPUT CARDINALITY can: a headline query's result is a summary
(aggregation / bounded top-k / per-doc stats), so its row count must be
O(table), never O(table²). The row cap here is the early-warning tripwire
the round-2 bench lacked; the time budget catches hangs and accidental
driver-side materialization.
"""

from __future__ import annotations

import time

import pytest

import bench
from nbi_oedi_etl_spark import workload

SF_DIR = "/root/testdata/sf0.01"

# documents=500, events=10k, lineitem=60k at sf0.01. A summary result is
# bounded by the largest per-row surface (per-lineitem windows ~60k rows,
# doc chunking ~O(docs × chunks)); anything past this smells quadratic.
MAX_ROWS = 200_000
# Per-query budget, generous for shared-host noise: batch headline queries
# run sub-second at this SF; the two streaming entries (availableNow drains)
# take a few seconds of fixed micro-batch overhead and still fit easily.
MAX_SECONDS = 60.0


@pytest.mark.parametrize("name", bench.HEADLINE)
def test_headline_query_bounded(spark, name):
    fn = workload.queries()[name]
    t0 = time.perf_counter()
    rows = fn(spark, SF_DIR).collect()
    dt = time.perf_counter() - t0
    assert len(rows) <= MAX_ROWS, (
        f"{name} returned {len(rows)} rows at sf0.01 — headline results "
        f"must be summary-sized (≤{MAX_ROWS}); a blow-up here is the "
        f"signature of a degenerate join/blocking key"
    )
    assert dt <= MAX_SECONDS, f"{name} took {dt:.1f}s at sf0.01 (budget {MAX_SECONDS}s)"


# ---- per-query regression guard against the round-7 reference bench ----
#
# tests/bench_reference_r7.json freezes every headline query's sf0.1
# MEDIAN-OF-3 from the round-7 bench (r7 verdict task 6: the r5 reference
# was per-query MIN while bench.py now reports median3 — comparing a
# median against a min-based ceiling is biased, so guard and headline now
# use the same estimator). Whenever bench.py runs (it rewrites
# BENCH_DETAIL.json), this test compares the fresh numbers
# query-by-query: >3x the reference (with a 5 s absolute floor absorbing
# the measured 5-30x shared-host noise spikes on sub-second queries)
# fails — so wave work can't silently regress an existing query. Skips
# when no sf0.1 detail file exists (e.g. a fresh clone before the first
# bench run).

import json as _json
import os as _os

_HERE = _os.path.dirname(__file__)
_REPO = _os.path.dirname(_HERE)


def test_no_per_query_regression_vs_reference():
    """Reference refreshed to round-11 (the r9/r10 discipline): the r11
    closing bench ran quiet (spread 1.30× min) and covers the 188
    headline queries of the r11 main window; doc_readability_forcast
    returned to band (0.39 s vs the r10 noise spike 0.69 s). The 6
    wave-2 additions (PQ family, epoch shuffle, CCNet buckets, IVF-PQ)
    are recorded from a calib-0.35 host and NORMALIZED to the file's
    quiet 0.27 frame (×0.771) — single-core calib under-captures
    multi-core steal, so those six run ~1.5× generous until the next
    quiet refresh (see the reference's note field).
    bench_reference_r7/r9/r10.json are kept for the round-over-round
    audit trail."""
    detail_path = _os.path.join(_REPO, "BENCH_DETAIL.json")
    if not _os.path.exists(detail_path):
        pytest.skip("no BENCH_DETAIL.json — run bench.py first")
    with open(detail_path) as f:
        detail = _json.load(f)
    if detail.get("sf") != 0.1:
        pytest.skip("BENCH_DETAIL.json is not an sf0.1 run")
    # Use the HIGHEST-numbered committed reference (r13: the quiet-window
    # refresh loop writes bench_reference_r13.json the moment a quiet
    # host appears — the guard must pick it up without a code change).
    import glob as _glob
    import re as _re

    # ADVICE r13 #1: (a) skip glob hits the round regex doesn't match
    # (a stray bench_reference_r13_old.json backup would AttributeError
    # the int(...) key); (b) refuse a reference that was force-written
    # past the quiet bars — --force stamps its note field, and silently
    # adopting it would re-baseline the guard on a degraded host.
    candidates = []
    for p in _glob.glob(_os.path.join(_HERE, "bench_reference_r*.json")):
        m = _re.search(r"_r(\d+)\.json$", p)
        if m is not None:
            candidates.append((int(m.group(1)), p))
    refs = [p for _, p in sorted(candidates)]
    with open(refs[-1]) as f:
        ref_doc = _json.load(f)
    assert "FORCED past the quiet bars" not in str(ref_doc.get("note", "")), (
        f"{refs[-1]} was force-written on a non-quiet host — re-record it "
        "with tools/refresh_bench_reference.py on a quiet window"
    )
    ref = ref_doc["queries"]
    # Host calibration (wave 2; r12 revision): co-tenant CPU steal slows
    # this VM up to ~5× without showing in loadavg, and a bench run on a
    # degraded host would trip dozens of queries that regressed nowhere
    # (observed: 18 false trips at calib 0.85-1.3 s vs the quiet 0.27).
    # Scale the budget by measured-host vs reference-host speed, taking
    # the WORSE of the single-core and multi-core tokens — r11 measured
    # a ~1.9× degraded window whose single-core calib read only 1.3×
    # (multi-core steal under-captured), which is exactly what the
    # calib_mt_s probe sees. The reference's calibs fall back to the
    # documented quiet-state values for references recorded before the
    # fields existed (single-core 0.27; multi-core 0.40 measured quiet
    # r12).
    # `or`-defaults treat a JSON null (or 0) token the same as an absent
    # one — a pre-r12 detail/reference file can carry calib_mt_s: null,
    # and float(None) would TypeError (ADVICE r12).
    ref_calib = float(ref_doc.get("calib_s") or 0.27)
    cur_calib = float(detail.get("calib_s") or ref_calib)
    ratio_1c = cur_calib / ref_calib
    ref_mt = float(ref_doc.get("calib_mt_s") or 0.40)
    cur_mt = float(detail.get("calib_mt_s") or -1.0)
    ratio_mt = (cur_mt / ref_mt) if cur_mt > 0 else ratio_1c
    raw_ratio = max(ratio_1c, ratio_mt)
    # ADVICE r11: scaling budgets all the way to 8× let a badly degraded
    # run certify anything (24× the reference median at the clamp). Past
    # 3× the host is too degraded to certify EITHER way — fail-as-skip
    # so the round's evidence honestly says "not measured quiet", rather
    # than green-lighting a real regression.
    if raw_ratio > 3.0:
        pytest.skip(
            f"host too degraded to certify bench numbers: calib ratio "
            f"{raw_ratio:.2f} (1-core {ratio_1c:.2f}, mt {ratio_mt:.2f}) "
            f"exceeds 3× the reference host — re-run bench.py quiet"
        )
    host_ratio = max(1.0, raw_ratio)
    regressions = []
    for name, ref_sec in ref.items():
        cur = detail["queries"].get(name)
        if cur is None:  # renamed/retired since r11 — rotation handles it
            continue
        budget = max(3.0 * ref_sec, 5.0) * host_ratio
        # min-sample fallback (r12): a co-tenant steal burst can land on
        # 2 of a query's 3 interleaved samples and inflate the MEDIAN
        # 10-30x (observed: minhash_lsh_portable samples [0.30, 4.46,
        # 7.21] in one degraded run); a genuine code regression lifts
        # ALL samples including the min. Fail only when the min sample
        # is over budget too.
        cur_min = detail.get("queries_min", {}).get(name, cur)
        if cur > budget and cur_min > budget:
            regressions.append(
                f"{name}: {cur:.2f}s (min {cur_min:.2f}s) vs r11 "
                f"{ref_sec:.2f}s (>{budget:.1f}s at host_ratio "
                f"{host_ratio:.2f})"
            )
    assert not regressions, "per-query bench regressions vs round-11:\n" + "\n".join(regressions)
