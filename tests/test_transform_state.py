"""transformWithStateInPandas surface (streaming/transform_state.py).

The StatefulProcessor's python state server speaks protobuf, which this
container lacks — the end-to-end test is skip-gated on that import (it
runs on any real cluster image), while the processor's accumulation logic
is exercised in-container through a faked StatefulProcessorHandle.
"""

from __future__ import annotations

import importlib.util

import pandas as pd
import pytest

from nbi_oedi_etl_spark.streaming import transform_state

_HAS_PROTOBUF = (
    importlib.util.find_spec("google") is not None
    and importlib.util.find_spec("google.protobuf") is not None
)


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        self.states[name] = _FakeValueState()
        return self.states[name]


def _run_batch(proc, key, micros_values):
    out = list(
        proc.handleInputRows(
            (key,), iter([pd.DataFrame({"micros": micros_values})]), None
        )
    )
    assert len(out) == 1
    return out[0].iloc[0]


def test_running_totals_processor_accumulates_across_batches():
    proc = transform_state.RunningTotalsProcessor()
    proc.init(_FakeHandle())
    r1 = _run_batch(proc, 7, [1_500_000, -250_000])
    assert (r1["user_id"], r1["n_events"], r1["total_micros"]) == (7, 2, 1_250_000)
    # second microbatch folds into carried state, never restarts
    r2 = _run_batch(proc, 7, [2_000_000])
    assert (r2["n_events"], r2["total_micros"]) == (3, 3_250_000)
    # multiple pandas chunks within one batch are one accumulation
    out = list(
        proc.handleInputRows(
            (7,),
            iter([pd.DataFrame({"micros": [1]}), pd.DataFrame({"micros": [2]})]),
            None,
        )
    )
    r3 = out[0].iloc[0]
    assert (r3["n_events"], r3["total_micros"]) == (5, 3_250_003)


@pytest.mark.skipif(not _HAS_PROTOBUF, reason="transformWithState python state server needs protobuf")
def test_streaming_running_totals_matches_batch_agg(spark):
    from pyspark.sql import functions as F

    from nbi_oedi_etl_spark import workload

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: (r["n_events"], r["total_micros"])
        for r in workload.queries()["streaming_running_totals"](spark, sf_dir).collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["total_micros"])
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.col("value").cast("decimal(18,6)")) * 1_000_000)
            .cast("long")
            .alias("total_micros"),
        )
        .collect()
    }
    assert got == want
