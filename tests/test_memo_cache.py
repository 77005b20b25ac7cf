"""Keying/eviction contract of the portable-pipeline DataFrame memos
(``workload_ext._memo_get``).

Round-5 advice: the old ``id(spark)`` key could be recycled by CPython
after a stopped session was garbage-collected, serving a localCheckpoint
bound to a dead SparkContext; entries were also never evicted, pinning
checkpoint RDDs across many-sf_dir sweeps. The fix keys on
``sparkContext.applicationId`` (minted per context — a restarted context
always misses; ``newSession()`` clones share it, and their checkpoints
remain valid) and FIFO-bounds the cache. Pure-logic tests via fakes: the
hazard is the keying, not the Spark build.
"""

from __future__ import annotations

from nbi_oedi_etl_spark import workload_ext as ext


class _FakeContext:
    def __init__(self, app_id: str) -> None:
        self.applicationId = app_id


class _FakeSession:
    def __init__(self, app_id: str) -> None:
        self.sparkContext = _FakeContext(app_id)


def test_same_context_reuses_and_restarted_context_rebuilds():
    cache: dict = {}
    builds = []

    def build_for(tag):
        def build():
            builds.append(tag)
            return f"df-{tag}"

        return build

    s1 = _FakeSession("local-100")
    assert ext._memo_get(cache, s1, "/sf", build_for("a")) == "df-a"
    assert ext._memo_get(cache, s1, "/sf", build_for("a2")) == "df-a"  # hit
    # a newSession() clone shares the context -> same key, still a hit
    clone = _FakeSession("local-100")
    assert ext._memo_get(cache, clone, "/sf", build_for("a3")) == "df-a"
    # id() recycling across a stop(): a NEW context (new applicationId) at
    # the same Python object address must MISS and rebuild
    s2 = _FakeSession("local-200")
    assert ext._memo_get(cache, s2, "/sf", build_for("b")) == "df-b"
    assert builds == ["a", "b"]


def test_distinct_sf_dirs_are_distinct_entries():
    cache: dict = {}
    s = _FakeSession("local-1")
    assert ext._memo_get(cache, s, "/sf/a", lambda: "A") == "A"
    assert ext._memo_get(cache, s, "/sf/b", lambda: "B") == "B"
    assert ext._memo_get(cache, s, "/sf/a", lambda: "A'") == "A"


def test_fifo_eviction_bounds_the_cache():
    cache: dict = {}
    s = _FakeSession("local-1")
    n = ext._MEMO_MAX_ENTRIES + 3
    for i in range(n):
        ext._memo_get(cache, s, f"/sf/{i}", lambda i=i: f"df-{i}")
    assert len(cache) == ext._MEMO_MAX_ENTRIES
    # oldest entries evicted -> rebuilt on next ask
    assert ext._memo_get(cache, s, "/sf/0", lambda: "rebuilt") == "rebuilt"
    # newest survive
    assert ext._memo_get(cache, s, f"/sf/{n-1}", lambda: "X") == f"df-{n-1}"


# ---------------------------------------------------------------------------
# Staged-split cache revalidation (workload_banded): a cached staging dir
# must be reused ONLY when all three part files survived; a partial OS
# tempdir sweep (part0/part1 gone, part2 alive — the pre-r14 check only
# looked at part2) must trigger a full re-stage, not a silent ~1/3 drain
# (ADVICE r13 #2 / VERDICT r13 minor finding).
# ---------------------------------------------------------------------------


def _write_tiny_table(path, n=9):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": [f"t{i}" for i in range(n)]}),
        path,
    )


def test_stage_mod3_split_restages_after_partial_sweep(tmp_path):
    import os

    from nbi_oedi_etl_spark import workload_banded as wb

    _write_tiny_table(str(tmp_path / "documents.parquet"))
    src = wb._stage_mod3_split(str(tmp_path), "documents", "doc_id", "t_")
    assert wb._staged_dir_intact(src)
    # plant the partial sweep: part2 survives, part0/part1 swept
    os.remove(os.path.join(src, "part0.parquet"))
    os.remove(os.path.join(src, "part1.parquet"))
    src2 = wb._stage_mod3_split(str(tmp_path), "documents", "doc_id", "t_")
    assert src2 != src and wb._staged_dir_intact(src2)
    # fully-intact dir is reused (memo hit, no re-stage)
    assert wb._stage_mod3_split(str(tmp_path), "documents", "doc_id", "t_") == src2


def test_stage_sliced_thirds_restages_after_partial_sweep(tmp_path):
    import os

    from nbi_oedi_etl_spark import workload_banded as wb

    _write_tiny_table(str(tmp_path / "events.parquet"))
    src = wb.stage_sliced_thirds(str(tmp_path), "events", "t_")
    assert wb._staged_dir_intact(src)
    os.remove(os.path.join(src, "part1.parquet"))
    src2 = wb.stage_sliced_thirds(str(tmp_path), "events", "t_")
    assert src2 != src and wb._staged_dir_intact(src2)
    assert wb.stage_sliced_thirds(str(tmp_path), "events", "t_") == src2


def test_stage_population_is_lock_guarded(tmp_path):
    """Concurrent first-callers must stage exactly once (ADVICE r13 #2:
    unsynchronized dict caches double-staged under concurrent probes)."""
    import concurrent.futures as cf

    from nbi_oedi_etl_spark import workload_banded as wb

    _write_tiny_table(str(tmp_path / "embeddings.parquet"))
    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        dirs = list(
            ex.map(
                lambda _: wb.stage_sliced_thirds(str(tmp_path), "embeddings", "t_"),
                range(8),
            )
        )
    assert len(set(dirs)) == 1
