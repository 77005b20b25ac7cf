"""Capture .explain("formatted") for named queries into plans/r14/.

Usage:
  python tools/capture_plans.py --tag before q1 q2 ...
  python tools/capture_plans.py --tag after  q1 q2 ...

Writes /root/repo/plans/r14/<query>_<tag>.txt. The sf_dir defaults to
sf0.1 (the bench scale) — plan SHAPE is scale-independent for these
queries, and building at bench scale keeps PartitionFilters/ReadSchema
strings representative of what the bench executes.
"""

from __future__ import annotations

import os
import sys

from nbi_oedi_etl_spark import get_spark, workload
from nbi_oedi_etl_spark.plans.explain import formatted_plan

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("PLANS_ROUND", "r15"))


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    names = []
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        else:
            names.append(a)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(
        app_name="capture-plans",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = workload.queries()
    for n in names:
        df = qs[n](spark, SF_DIR)
        path = os.path.join(OUT_DIR, f"{n}_{tag}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
