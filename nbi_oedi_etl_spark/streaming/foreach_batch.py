"""foreachBatch sinks: the arbitrary-sink escape hatch with exactly-once
discipline (SURVEY.md §2.9 — the reference's uploader, upload.py:16-62, is
an at-least-once PUT loop whose duplicate-safety comes from full-key
overwrite; these are the Spark-native equivalents).

Structured Streaming guarantees foreachBatch is called with each batch_id
AT LEAST once (a crashed batch is retried with the same id), so a sink is
exactly-once iff replaying (batch_id, same data) lands in the same final
state. Two standard shapes:

- ``partitioned_overwrite_sink``: dynamic partition overwrite — a replay
  rewrites exactly the partitions the batch touches with identical bytes.
  Idempotent with no transaction log; the 100 TB pattern for time- or
  key-partitioned continuous ingest (each micro-batch owns whole
  partitions, e.g. event-date).
- ``ledger_append_sink``: append guarded by a batch-id ledger — a replayed
  batch_id is skipped. Covers sinks where overwrite granularity doesn't
  match the batch (e.g. appending to a shared fact directory).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame


def partitioned_overwrite_sink(
    output_dir: str, partition_cols: list[str]
) -> Callable[[DataFrame, int], None]:
    """Idempotent foreachBatch writer: dynamic-mode partition overwrite.

    Replaying a batch overwrites the same partitions with the same rows —
    the final directory state is independent of retries. Partitions NOT
    present in the batch are untouched (dynamic mode), so concurrent
    history stays intact.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
            .parquet(output_dir)
        )

    return write_batch


def ledger_append_sink(
    output_dir: str, ledger_dir: str
) -> Callable[[DataFrame, int], None]:
    """Append-only sink made exactly-once by a batch-id ledger: a batch id
    that already has a ledger marker is a retry and is skipped. The marker
    is written AFTER the data commit, so a crash between the two replays
    the append — the parquet files of the half-committed attempt are
    shadowed because Spark's own _SUCCESS-committed files from the retry
    replace the uncommitted temporary ones; the ledger closes the window
    where the batch would be appended twice."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(ledger_dir, f"batch-{batch_id}")
        if os.path.exists(marker):
            return
        batch_df.write.mode("append").parquet(output_dir)
        os.makedirs(ledger_dir, exist_ok=True)
        with open(marker, "w") as f:
            f.write("committed")

    return write_batch
