"""Custom stateful streaming operator: arbitrary per-key session state via
``applyInPandasWithState`` (SURVEY.md §2.9 — beyond reference scope; the
engine's slot for stateful logic that ``session_window`` can't express,
e.g. carrying arbitrary aggregates/IDs through a session).

Semantics: per user, events closer than ``gap`` belong to one session. A
session is EMITTED when the event-time watermark passes ``last_ts + gap``
(its GroupState times out). Sessions still open when the stream drains stay
in state — streaming can never know a tail session ended (the batch
sessionizer, operators/sessions.py, is the complete-history view; the unit
test ties the two together: streamed sessions == batch sessions that closed
before the final watermark).

Scale: state is one tiny tuple per ACTIVE user (not per event) — a 100 TB/day
stream with 100 M active users holds ~GBs of state sharded across executors;
the watermark timeout evicts idle users, so state is bounded by concurrent
activity, not history. Input rows reach each group pre-shuffled by user_id —
the same single shuffle the batch groupBy would pay.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
    ]
)

# (session_start_us, last_ts_us, n_events) — epoch-µs longs; timestamps in
# GroupState round-trip more simply as integers.
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", IntegerType()),
    ]
)


def _emit(user_id: int, start_us: int, last_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
        }
    )


def make_sessionizer(gap_seconds: int):
    """Build the applyInPandasWithState function for a session gap."""
    gap_us = gap_seconds * 1_000_000

    def sessionize(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield _emit(user_id, start_us, last_us, n)
            return
        ts_us = (
            pd.concat(list(pdfs))["ts"].astype("int64") // 1000
        ).sort_values()  # ns → µs
        start_us, last_us, n = state.get if state.exists else (None, None, 0)
        closed: list[pd.DataFrame] = []
        for t in ts_us:
            t = int(t)
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us >= gap_us:  # exactly-gap starts a new session,
                # matching session_window's strictly-before merge rule
                # (operators/sessions.py semantics note)
                closed.append(_emit(user_id, start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                # A later microbatch can deliver an event older than the
                # carried state (late but within watermark): extend the
                # session bounds, never regress them.
                start_us, last_us, n = min(start_us, t), max(last_us, t), n + 1
        state.update((start_us, last_us, n))
        # close the open session when the watermark passes last_ts + gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        yield from closed

    return sessionize


def stateful_user_sessions(
    stream: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "1 minute",
) -> DataFrame:
    """Streamed gap-based sessionization with custom per-user state."""
    withw = stream.withWatermark(ts_col, watermark)
    return withw.groupBy(user_col).applyInPandasWithState(
        make_sessionizer(gap_seconds),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
