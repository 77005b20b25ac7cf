"""Arbitrary stateful streaming via ``transformWithStateInPandas`` (Spark
4's StatefulProcessor API) — the successor surface to
``applyInPandasWithState`` (streaming/stateful.py): named state variables
(Value/List/Map) with per-variable schemas and TTL, timers, and initial
state, instead of one opaque state tuple per key.

Operator here: **running per-key totals** — for each user, a ValueState
carries (event count, exact micro-unit value sum); every microbatch folds
its rows into the carried state and emits the updated running totals. This
is the continuous-ingest counterpart of a batch ``groupBy(user).agg(count,
sum)``: after a full drain, the LAST emission per user equals the batch
aggregate over everything ingested (the registry query's oracle), while
each intermediate emission is the exact running total at that microbatch —
state the batch path would recompute from scratch per run.

Exactness contract: ``value`` is quantized to DECIMAL(18,6) micro-units
(an int64) on the Spark side BEFORE the python worker, so the python-side
accumulation is integer arithmetic — no float fold-order dependence, and
the totals match a decimal-summing SQL oracle bit-for-bit.

Scale: state is one 16-byte tuple per distinct key, sharded by the same
hash shuffle a batch groupBy would pay — 100 M active users ≈ GBs across
executors, bounded by key cardinality, not stream length. (Pass
``ttl_ms`` to evict keys idle longer than the TTL — processing-time TTL
is the StatefulProcessor-native replacement for hand-rolled eviction.)

Reference parity: the reference's monitor accumulates per-stage running
counters in a shared dict as files flow through (monitor.py:44-85) — this
operator is that same "running totals over an unbounded feed" semantic,
keyed and distributed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import LongType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_micros", LongType()),
    ]
)

_STATE_SCHEMA = "n BIGINT, micros BIGINT"


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (count, integer micro-unit sum) in a ValueState."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA, self._ttl_ms)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, micros = 0, 0
        for pdf in rows:
            n += len(pdf)
            micros += int(pdf["micros"].sum())
        prev = self._totals.get() if self._totals.exists() else None
        if prev is not None:
            n, micros = n + prev[0], micros + prev[1]
        self._totals.update((n, micros))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_micros": [micros]}
        )

    def close(self) -> None:
        pass


def running_user_totals(
    stream: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Attach the running-totals processor to a stream.

    Emits one (user_id, n_events, total_micros) row per key per microbatch
    (update mode) — ``total_micros`` is the exact DECIMAL(18,6) sum scaled
    by 1e6.
    """
    from pyspark.sql import functions as F

    quantized = stream.select(
        F.col(user_col).alias("user_id"),
        (F.col(value_col).cast("decimal(18,6)") * 1_000_000)
        .cast("long")
        .alias("micros"),
    )
    return quantized.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
