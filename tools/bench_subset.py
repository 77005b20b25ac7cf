"""Time a SUBSET of bench.py's headline queries with the same methodology
(collect() action, interleaved passes, median estimator, host calibration)
— the optimization round's fast iteration loop. bench.py itself stays the
driver contract; this tool exists so a per-query change can be re-measured
in ~a minute instead of a full 199-query run.

Usage:
  python tools/bench_subset.py q1 q2 ...        # 3 interleaved passes
  PASSES=5 python tools/bench_subset.py q1 ...
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/bench_subset.py ...
"""

from __future__ import annotations

import json
import os
import sys
import time

from nbi_oedi_etl_spark import get_spark, workload

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _calib() -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        s = 0
        for i in range(10**7):
            s += i
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    passes = int(os.environ.get("PASSES", "3"))
    spark = get_spark(
        app_name="bench-subset",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = workload.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    # same warmup as bench.py
    qs["ref_q1_count_distinct"](spark, "/root/testdata/sf0.001").collect()
    qs["embedding_ivf_topk"](spark, "/root/testdata/sf0.001").collect()

    sampled: dict[str, list[float]] = {n: [] for n in names}
    calibs = []
    for _ in range(passes):
        calibs.append(_calib())
        for name in names:
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).collect()
            sampled[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    med = {}
    for n, ss in sampled.items():
        ss_sorted = sorted(ss)
        med[n] = ss_sorted[len(ss_sorted) // 2]
    print(json.dumps({
        "sf_dir": SF_DIR,
        "passes": passes,
        "calib_samples": calibs,
        "median": med,
        "samples": sampled,
        "total_median": round(sum(med.values()), 3),
    }, indent=1), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
