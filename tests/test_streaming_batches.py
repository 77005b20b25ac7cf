"""Multi-microbatch streaming tests: the round-1 shipped tests drained
everything in one availableNow batch (pre-sorted input), which cannot catch
cross-batch state bugs. Here maxFilesPerTrigger=1 forces one microbatch per
file, so carried GroupState meets genuinely late (out-of-order but
within-watermark) events.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(path, ts_list):
    t = pa.table(
        {
            "user_id": pa.array([1] * len(ts_list), pa.int64()),
            "ts": pa.array(ts_list, pa.timestamp("us", tz="UTC")),
        }
    )
    pq.write_table(t, path)


def test_stateful_sessions_two_batch_out_of_order(spark, tmp_path):
    """Batch 1 delivers events at 10:00 and 10:10; batch 2 delivers a late
    10:05 (within the 30-min watermark) plus a 13:00 event that closes the
    session. The emitted session must span 10:00-10:10 with 3 events — the
    pre-fix sessionizer regressed session_end to the late 10:05."""
    from nbi_oedi_etl_spark.streaming import stateful

    d = tmp_path / "stream"
    d.mkdir()
    base = dt.datetime(2024, 1, 1, 10, 0, tzinfo=dt.timezone.utc)
    m = dt.timedelta(minutes=1)
    _write_events(d / "a.parquet", [base, base + 10 * m])
    _write_events(d / "b.parquet", [base + 5 * m, base + 180 * m])
    # file-source batch order follows modification time — pin it
    os.utime(d / "a.parquet", (1_000_000, 1_000_000))
    os.utime(d / "b.parquet", (2_000_000, 2_000_000))

    schema = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )
    sess = stateful.stateful_user_sessions(
        stream, gap_seconds=1800, watermark="30 minutes"
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            sess.writeStream.format("memory")
            .queryName("oo_sessions")
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp())
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    rows = spark.table("oo_sessions").collect()
    assert len(rows) == 1, rows  # the 13:00 tail session stays open in state
    r = rows[0]
    naive = base.replace(tzinfo=None)
    assert r["user_id"] == 1
    assert r["session_start"] == naive
    assert r["session_end"] == naive + 10 * m, "late event regressed session_end"
    assert r["n_events"] == 3


def test_idle_timeout_watchdog_stops_drained_stream(spark, tmp_path):
    """T4 parity (reference monitor.py:221-274): a continuous-trigger query
    over a static directory keeps producing empty micro-batches; the idle
    watchdog must stop it once no rows have arrived for the timeout, and
    the rows from the initial batches must have landed."""
    import datetime as dt
    import tempfile

    from nbi_oedi_etl_spark.streaming import ingest

    d = tmp_path / "stream"
    d.mkdir()
    base = dt.datetime(2024, 1, 1, 10, 0, tzinfo=dt.timezone.utc)
    _write_events(d / "a.parquet", [base, base + dt.timedelta(minutes=1)])

    schema = spark.read.parquet(str(d)).schema
    stream = spark.readStream.schema(schema).parquet(str(d))
    counts = stream.groupBy("user_id").count()
    q = (
        counts.writeStream.format("memory")
        .queryName("idle_watchdog_sink")
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    # No pre-arming dance (the r13 test workaround): since r14 the
    # watchdog itself arms its idle clock on the first COMPLETED batch,
    # so a slow first micro-batch on a steal-degraded host is pending
    # input, not idleness — the original un-hardened call shape is the
    # contract under test.
    stopped = ingest.await_with_idle_timeout(q, idle_timeout_seconds=3.0)
    assert stopped, "watchdog did not stop the idle query"
    assert not q.isActive
    rows = spark.table("idle_watchdog_sink").collect()
    assert {(r["user_id"], r["count"]) for r in rows} == {(1, 2)}


class _FakeQuery:
    """Pure-Python stand-in exercising exactly the StreamingQuery surface
    ``await_with_idle_timeout`` touches (isActive / recentProgress /
    stop / awaitTermination), so the slow-first-batch contract is tested
    deterministically instead of depending on host scheduling."""

    def __init__(self, schedule):
        # schedule: list of (delay_from_start_s, progress_dict) to publish
        import time

        self._t0 = time.monotonic()
        self._schedule = list(schedule)
        self._published = []
        self.isActive = True
        self.stopped_by_watchdog = False

    @property
    def recentProgress(self):
        import time

        now = time.monotonic() - self._t0
        while self._schedule and self._schedule[0][0] <= now:
            self._published.append(self._schedule.pop(0)[1])
        return list(self._published)

    def stop(self):
        self.stopped_by_watchdog = True
        self.isActive = False

    def awaitTermination(self, timeout=None):
        return True


def test_idle_watchdog_survives_first_batch_slower_than_timeout():
    """The r13 divergence, pinned: a first micro-batch that takes LONGER
    than idle_timeout must NOT be killed — no completed batch means
    pending input (reference monitor.py:221-274 queues-empty semantics).
    The clock arms on that first completion, then fires after a further
    idle period."""
    from nbi_oedi_etl_spark.streaming import ingest

    # First batch completes at t=0.9s — 3x the 0.3s idle timeout. Under
    # the pre-r14 call-time arming the watchdog would fire at ~0.3s with
    # zero batches landed.
    q = _FakeQuery([(0.9, {"id": "q", "batchId": 0, "numInputRows": 5})])
    stopped = ingest.await_with_idle_timeout(
        q, idle_timeout_seconds=0.3, poll_seconds=0.05
    )
    assert stopped and q.stopped_by_watchdog
    # the batch must have been observed before the stop (clock armed on it)
    assert len(q._published) == 1


def test_idle_watchdog_arms_on_empty_first_batch():
    """A COMPLETED zero-row first batch is the Spark-side witness that
    the queues have drained — the clock arms there, and the watchdog
    fires one idle period later (never before the batch completes)."""
    import time

    from nbi_oedi_etl_spark.streaming import ingest

    q = _FakeQuery([(0.4, {"id": "q", "batchId": 0, "numInputRows": 0})])
    t0 = time.monotonic()
    stopped = ingest.await_with_idle_timeout(
        q, idle_timeout_seconds=0.3, poll_seconds=0.05
    )
    elapsed = time.monotonic() - t0
    assert stopped and q.stopped_by_watchdog
    # fired after batch-completion (0.4s) + idle (0.3s), not call + 0.3s
    assert elapsed >= 0.65, elapsed


def test_idle_watchdog_returns_false_when_query_ends_on_its_own():
    """A query that terminates before any batch completes (availableNow
    over an empty source) must return False without a watchdog stop —
    never a spurious kill of a stream that was still starting up."""
    import threading
    import time

    from nbi_oedi_etl_spark.streaming import ingest

    q = _FakeQuery([])

    def _finish():
        time.sleep(0.25)
        q.isActive = False

    t = threading.Thread(target=_finish)
    t.start()
    stopped = ingest.await_with_idle_timeout(
        q, idle_timeout_seconds=5.0, poll_seconds=0.05
    )
    t.join()
    assert stopped is False and not q.stopped_by_watchdog


def _write_typed_events(path, rows):
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us", tz="UTC")),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, path)


def test_foreach_batch_partitioned_overwrite_is_idempotent(spark, tmp_path):
    """Two microbatches write per-user daily sums via dynamic partition
    overwrite; replaying the last batch's payload by hand must leave the
    output byte-identical (exactly-once despite at-least-once delivery)."""
    from pyspark.sql import functions as F

    from nbi_oedi_etl_spark.streaming import foreach_batch

    d = tmp_path / "in"
    d.mkdir()
    day1 = dt.datetime(2024, 1, 1, 10, 0, tzinfo=dt.timezone.utc)
    day2 = dt.datetime(2024, 1, 2, 10, 0, tzinfo=dt.timezone.utc)
    # partition-aligned batches: the idempotent-overwrite contract requires
    # each microbatch to own the partitions it writes (file == event-date
    # here, the usual continuous-ingest layout)
    _write_typed_events(d / "a.parquet", [(1, day1, 2.0), (2, day1, 3.0)])
    _write_typed_events(d / "b.parquet", [(1, day2, 5.0), (3, day2, 4.0)])
    os.utime(d / "a.parquet", (1_000_000, 1_000_000))
    os.utime(d / "b.parquet", (2_000_000, 2_000_000))
    out = str(tmp_path / "out")
    sink = foreach_batch.partitioned_overwrite_sink(out, ["event_date"])
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
        .withColumn("event_date", F.to_date("ts"))
        .select("event_date", "user_id", "value")
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    first = sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    )
    # batch 2's payload replayed (simulated retry with same data)
    replay = (
        spark.read.parquet(str(d / "b.parquet"))
        .withColumn("event_date", F.to_date("ts"))
        .select("event_date", "user_id", "value")
    )
    sink(replay, 1)
    second = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert first == second
    # batch 1's day1 partition untouched by batch 2's day2 overwrite
    assert len(first) == 4


def test_foreach_batch_ledger_skips_replayed_batch(spark, tmp_path):
    """The ledger sink appends a batch once; a second call with the same
    batch_id is a no-op, a new batch_id appends."""
    from nbi_oedi_etl_spark.streaming import foreach_batch

    out, ledger = str(tmp_path / "out"), str(tmp_path / "ledger")
    sink = foreach_batch.ledger_append_sink(out, ledger)
    df = spark.range(5).withColumnRenamed("id", "k")
    sink(df, 0)
    sink(df, 0)  # retry: must not double-append
    assert spark.read.parquet(out).count() == 5
    sink(df, 1)
    assert spark.read.parquet(out).count() == 10


def test_sketches_merge_across_microbatches(spark, tmp_path):
    """CMS cells (sum-merge) and HLL registers (max-merge) accumulated
    over per-file micro-batches must equal the one-shot batch sketch over
    the union — the mergeable-monoid property that makes the sketches
    usable in foreachBatch / cross-shard union at scale."""
    from collections import defaultdict

    from nbi_oedi_etl_spark.operators import sketches

    d = tmp_path / "docs"
    d.mkdir()
    t1 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                   "text": ["alpha beta gamma", "beta gamma delta"]})
    t2 = pa.table({"doc_id": pa.array([3, 4], pa.int64()),
                   "text": ["gamma delta epsilon", "zeta alpha alpha"]})
    pq.write_table(t1, d / "a.parquet")
    pq.write_table(t2, d / "b.parquet")
    os.utime(d / "a.parquet", (1_000_000, 1_000_000))
    os.utime(d / "b.parquet", (2_000_000, 2_000_000))

    schema = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )
    cms_state: dict = defaultdict(int)
    hll_state: dict = defaultdict(int)
    n_batches = []

    def merge(batch_df, batch_id):
        toks = sketches.tokens_of(batch_df)
        for r in sketches.cms_cells(toks, depth=4, width=64).collect():
            cms_state[(r["seed"], r["bucket"])] += r["cell"]
        for r in sketches.hll_registers(toks, m=16).collect():
            hll_state[r["j"]] = max(hll_state[r["j"]], r["reg"])
        n_batches.append(batch_id)

    q = stream.writeStream.foreachBatch(merge).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert len(n_batches) == 2, "expected one micro-batch per file"

    batch_toks = sketches.tokens_of(spark.read.parquet(str(d)))
    ref_cms = {
        (r["seed"], r["bucket"]): r["cell"]
        for r in sketches.cms_cells(batch_toks, depth=4, width=64).collect()
    }
    ref_hll = {
        r["j"]: r["reg"] for r in sketches.hll_registers(batch_toks, m=16).collect()
    }
    assert dict(cms_state) == ref_cms
    assert dict(hll_state) == ref_hll
