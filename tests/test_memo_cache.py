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
