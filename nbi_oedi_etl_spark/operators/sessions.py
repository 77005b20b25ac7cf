"""Sessionization — session windows over the events table (SURVEY.md §2.9:
watermarks/session windows are 'absent in reference; engine exposes
session_window() as declared extension').

Batch form uses the built-in ``session_window`` (gap-merged windows); the
streaming form composes with ``withWatermark`` unchanged.

Scale: one shuffle on the entity key; state per open session only (in
streaming, the watermark evicts closed sessions).

Semantics note (oracle parity): Spark merges an event into a session iff
its timestamp is STRICTLY before the current session end (= last ts + gap);
a gap of exactly ``gap`` starts a new session. The gaps-and-islands SQL
twin must use ``>= gap`` for its new-session flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_sessions(
    events: DataFrame,
    ts_col: str = "ts",
    entity_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-entity session windows: (entity, session_start, n_events)."""
    out = (
        events.groupBy(
            F.col(entity_col), F.session_window(F.col(ts_col), gap).alias("sw")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(entity_col),
            F.col("sw.start").alias("session_start"),
            "n_events",
        )
    )
    return out
