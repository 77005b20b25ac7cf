"""Freeze the current BENCH_DETAIL.json as the per-query regression
reference for the guard (tests/test_bench_guard.py).

Refuses to freeze a degraded-host run: the whole point of the reference
is that budgets are measured from a QUIET frame (VERDICT r11 task 3 —
the r11 reference's 6 normalized entries carried ~1.5x slack precisely
because they were recorded under steal). Quiet bars, matching the
repo's documented thresholds:

- single-core calib within QUIET_CALIB_MAX (documented quiet ~0.27
  s/1e7; bar 0.32 allows normal jitter);
- multi-core calib within QUIET_CALIB_MT_MAX (documented quiet ~0.39;
  bar 0.48) — single-core under-captures multi-core steal (r11 saw a
  1.9x degraded window reading only 1.3x single-core), and a reference
  frozen under multi-core steal would permanently loosen the guard
  (ADVICE r12). Absent token (pre-r12 detail file) = not quiet;
- spread (sum of per-query min vs sum of medians) within SPREAD_MAX —
  a degraded window inflates some passes more than others.

Usage:
    python tools/refresh_bench_reference.py --round 12 [--force]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUIET_CALIB_MAX = 0.32
QUIET_CALIB_MT_MAX = 0.48
SPREAD_MAX = 1.5


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--force", action="store_true",
                    help="freeze even if the quiet bars fail (records why)")
    args = ap.parse_args()

    with open(os.path.join(_REPO, "BENCH_DETAIL.json")) as f:
        detail = json.load(f)
    if detail.get("sf") != 0.1:
        print(f"refusing: BENCH_DETAIL.json is sf={detail.get('sf')}, not 0.1")
        return 1
    calib = float(detail.get("calib_s", -1))
    # Treat an absent/null/non-positive mt token (pre-r12 detail file) as
    # not-quiet rather than writing JSON null into the reference — the
    # guard's float(ref.get("calib_mt_s", 0.40)) would TypeError on null
    # (ADVICE r12).
    calib_mt_raw = detail.get("calib_mt_s")
    calib_mt = float(calib_mt_raw) if calib_mt_raw else -1.0
    total = float(detail["value"])
    lo = float(detail["spread"][0])
    spread_ratio = total / lo if lo > 0 else float("inf")
    quiet = (
        0 < calib <= QUIET_CALIB_MAX
        and 0 < calib_mt <= QUIET_CALIB_MT_MAX
        and spread_ratio <= SPREAD_MAX
    )
    if not quiet and not args.force:
        print(
            f"refusing: not a quiet run (calib_s {calib} vs bar "
            f"{QUIET_CALIB_MAX}; calib_mt_s {calib_mt} vs bar "
            f"{QUIET_CALIB_MT_MAX}; spread {spread_ratio:.2f}x min vs bar "
            f"{SPREAD_MAX}) — re-run bench.py on a quiet host or --force"
        )
        return 1

    out = {
        "total_wall": total,
        "n_queries": len(detail["queries"]),
        "calib_s": calib,
        "queries": detail["queries"],
        "note": (
            f"per-query sf0.1 MEDIAN-OF-3 frozen from a round-{args.round} "
            f"bench run (total {total}s over {len(detail['queries'])} "
            f"queries, spread {spread_ratio:.2f}x min, calib {calib}); "
            "regression-guard reference for tests/test_bench_guard.py. "
            "total_wall IS the sum of the queries map."
            + ("" if quiet else " FORCED past the quiet bars — see ledger.")
        ),
    }
    if calib_mt > 0:
        # Omit (rather than null) when the detail file predates the r12
        # mt token so the guard's .get(..., default) path applies.
        out["calib_mt_s"] = calib_mt
    dest = os.path.join(_REPO, "tests", f"bench_reference_r{args.round}.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {dest} (quiet={quiet}, calib={calib}, "
          f"spread={spread_ratio:.2f}x, mt={out.get('calib_mt_s', 'absent')})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
