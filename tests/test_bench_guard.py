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
