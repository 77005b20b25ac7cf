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
    """Build the applyInPandasWithState function for a session gap.

    The per-batch group work is vectorized (the framework already calls
    this once per user per micro-batch; a per-EVENT Python loop plus a
    1-row DataFrame per closed session made the big first batch ~4x
    slower): session boundaries fall out of one numpy diff-vs-gap mask
    over the sorted event times, and every closed session ships in ONE
    emitted frame. Semantics are unchanged — exactly-gap starts a new
    session (session_window's strictly-before merge rule), and carried
    state merges into the first run only when the first event is within
    gap of it; events later than the carried bounds can only extend
    them, never regress them (max(l0, arr[i-1]) collapses to arr[i-1]
    for every event after the first boundary, so one uniform mask
    covers both the merged and the closed-carried cases)."""
    import numpy as np

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
        arr = np.sort(
            (pd.concat(list(pdfs))["ts"].astype("int64") // 1000).to_numpy()
        )  # ns → µs, ascending
        exists = state.exists
        s0, l0, n0 = state.get if exists else (None, None, 0)
        if len(arr) == 0:  # defensive: nothing to fold, keep state alive
            if exists:
                state.update((s0, l0, n0))
                state.setTimeoutTimestamp(l0 // 1000 + gap_seconds * 1000)
            return
        # effective predecessor of event i: max(carried last, arr[i-1]);
        # after any boundary the carried term is dominated, so the
        # uniform maximum is exact for the whole array
        prev_eff = np.empty_like(arr)
        # boundary[0]'s value is irrelevant without carried state: the
        # starts normalization below always includes index 0 regardless
        prev_eff[0] = l0 if exists else arr[0] - gap_us
        prev_eff[1:] = arr[:-1]
        if exists:
            np.maximum(prev_eff, l0, out=prev_eff)
        boundary = (arr - prev_eff) >= gap_us
        closed_rows: list[tuple[int, int, int]] = []  # (start, end, n)
        if exists and boundary[0]:
            closed_rows.append((s0, l0, n0))  # carried session closes alone
        starts = np.flatnonzero(boundary)
        if len(starts) == 0 or starts[0] != 0:
            starts = np.concatenate(([0], starts))
        ends = np.append(starts[1:], len(arr))
        merge_first = exists and not boundary[0]
        for k in range(len(starts)):
            st = int(arr[starts[k]])
            en = int(arr[ends[k] - 1])
            cnt = int(ends[k] - starts[k])
            if k == 0 and merge_first:
                st, en, cnt = min(s0, st), max(l0, en), n0 + cnt
            if k < len(starts) - 1:
                closed_rows.append((st, en, cnt))
            else:
                start_us, last_us, n = st, en, cnt
        state.update((start_us, last_us, n))
        # close the open session when the watermark passes last_ts + gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        if closed_rows:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed_rows),
                    "session_start": [
                        pd.Timestamp(r[0], unit="us") for r in closed_rows
                    ],
                    "session_end": [
                        pd.Timestamp(r[1], unit="us") for r in closed_rows
                    ],
                    "n_events": [r[2] for r in closed_rows],
                }
            )

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
