"""Fault-injection representatives (r8 headline, VERDICT r7 task 1).

Pytest-sized pins of what ``tools/fault_sweep.py`` proves exhaustively:
the reference's drop-and-report contract (monitor.py:87-136,
transform.py:168-170 — a file that fails transformation is dropped and
surfaced, never silently half-processed) under injected parquet faults,
and bounded-work ValueError quarantine for adversarial codec payloads.
The exhaustive sweep's committed results live in FAULT_SWEEP.json.
"""

from __future__ import annotations

import pathlib
import shutil
import sys
import time

import pandas as pd
import pytest

from nbi_oedi_etl_spark.operators import multimodal as mm
from nbi_oedi_etl_spark.sources.quarantine import read_with_quarantine

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO / "tools"))

import fault_sweep  # noqa: E402

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def faulted_orders(tmp_path_factory):
    """orders.parquet as a directory: pristine part + 3 planted corruptions."""
    d = tmp_path_factory.mktemp("faulted") / "orders.parquet"
    d.mkdir()
    data = (pathlib.Path(SF) / "orders.parquet").read_bytes()
    (d / "part-00000.parquet").write_bytes(data)
    for name, blob in fault_sweep._corruptions(data).items():
        (d / name).write_bytes(blob)
    return d


def test_default_read_fails_loudly(spark, faulted_orders):
    """Anti-silent-loss: a default scan over a dir with corrupt parts must
    raise, not return a subset."""
    with pytest.raises(Exception):
        spark.read.parquet(str(faulted_orders)).count()


def test_quarantine_drops_exactly_the_planted_files(spark, faulted_orders):
    parts = sorted(str(p) for p in faulted_orders.iterdir())
    df, rep = read_with_quarantine(spark, parts)
    assert sorted(pathlib.Path(p).name for p in rep.quarantined) == sorted(
        fault_sweep._PLANTED
    )
    pristine = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert df.count() == pristine


def test_quarantine_no_false_positives_on_pristine(spark):
    _, rep = read_with_quarantine(spark, [f"{SF}/orders.parquet"])
    assert rep.quarantined == []


def test_cleaned_replica_registry_representative(spark, faulted_orders, tmp_path):
    """File-level clean (copy quarantine-approved parts) -> a registry query
    over the mixed single-file/directory layout matches pristine exactly."""
    from nbi_oedi_etl_spark import workload

    for t in fault_sweep._tables():
        if t == "orders":
            d = tmp_path / "orders.parquet"
            d.mkdir()
            parts = sorted(str(p) for p in faulted_orders.iterdir())
            _, rep = read_with_quarantine(spark, parts)
            for i, p in enumerate(rep.readable):
                shutil.copyfile(p, d / f"part-{i:05d}.parquet")
        else:
            (tmp_path / f"{t}.parquet").symlink_to(f"{SF}/{t}.parquet")
    q = workload.queries()["customer_order_counts"]
    got = sorted(map(tuple, q(spark, str(tmp_path)).collect()))
    want = sorted(map(tuple, q(spark, SF).collect()))
    assert got == want


def test_streaming_reads_directory_layout(spark, tmp_path):
    """The r8 sweep found the streaming tier assumed single-file
    ``events.parquet``; both the glob path and the heartbeat drain must
    handle a directory of parts (every real warehouse layout)."""
    from nbi_oedi_etl_spark import workload

    for t in fault_sweep._tables():
        d = tmp_path / f"{t}.parquet"
        d.mkdir()
        shutil.copyfile(f"{SF}/{t}.parquet", d / "part-00000.parquet")
    q = workload.queries()["streaming_sliding_window_counts"]
    got = sorted(map(tuple, q(spark, str(tmp_path)).collect()))
    want = sorted(map(tuple, q(spark, SF).collect()))
    assert got == want


def test_csv_row_quarantine_drop_and_report(spark, tmp_path):
    """Row-level drop-and-report for CSV (the row-grain analogue of the
    parquet file-level quarantine): malformed lines land in the
    quarantine frame with their RAW text; clean rows are untouched."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from nbi_oedi_etl_spark.sources import read_csv, read_csv_with_quarantine

    d = tmp_path / "csv"
    d.mkdir()
    (d / "part-0.csv").write_text(
        "k,v\n1,alpha\n2,beta\nnot-a-number,gamma\n4,delta\n"
    )
    schema = StructType(
        [StructField("k", LongType()), StructField("v", StringType())]
    )
    clean, bad = read_csv_with_quarantine(spark, str(d), schema)
    assert sorted((r["k"], r["v"]) for r in clean.collect()) == [
        (1, "alpha"),
        (2, "beta"),
        (4, "delta"),
    ]
    assert [r["raw_record"] for r in bad.collect()] == ["not-a-number,gamma"]
    # the loud-ingest policy raises instead
    with pytest.raises(Exception):
        read_csv(spark, str(d), schema=schema, mode="FAILFAST").collect()
    # and DROPMALFORMED silently drops — the shape quarantine replaces.
    # collect(), not count(): count() prunes every column, so nothing is
    # parsed and nothing counts as malformed (classic CSV-mode trap)
    assert (
        len(read_csv(spark, str(d), schema=schema, mode="DROPMALFORMED").collect())
        == 3
    )


def test_json_row_quarantine_drop_and_report(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from nbi_oedi_etl_spark.sources import read_json_with_quarantine

    d = tmp_path / "json"
    d.mkdir()
    (d / "part-0.json").write_text(
        '{"k": 1, "v": "alpha"}\n{"k": 2 "v": "broken"}\n{"k": 3, "v": "gamma"}\n'
    )
    schema = StructType(
        [StructField("k", LongType()), StructField("v", StringType())]
    )
    clean, bad = read_json_with_quarantine(spark, str(d), schema)
    assert sorted((r["k"], r["v"]) for r in clean.collect()) == [
        (1, "alpha"),
        (3, "gamma"),
    ]
    assert [r["raw_record"] for r in bad.collect()] == ['{"k": 2 "v": "broken"}']


def test_ingest_untrusted_quarantines_reconciles_and_checksums(
    spark, faulted_orders, tmp_path
):
    """The trust-boundary ingest (sources.quarantine.ingest_untrusted):
    unreadable external files are quarantined, survivors are re-encoded
    through the engine's CRC-checksummed sink in ONE fused scan+write pass
    (observe counts rows during the write job), and the report reconciles
    rows in vs out. The re-encoded copy must then catch mid-page bit flips
    LOUDLY — the exact silent-alteration hazard FAULT_SWEEP.json records
    for CRC-less external parquet."""
    import random

    from nbi_oedi_etl_spark.sources import ingest_untrusted

    parts = sorted(str(p) for p in faulted_orders.iterdir())
    dest = tmp_path / "orders_ingested"
    rep = ingest_untrusted(spark, parts, str(dest))
    assert sorted(pathlib.Path(p).name for p in rep.files.quarantined) == sorted(
        fault_sweep._PLANTED
    )
    pristine = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert rep.rows_read == rep.rows_written == pristine
    assert rep.reconciled
    # the defensive copy carries page CRCs: a flip is caught or lands in
    # dead bytes — NEVER a silent value change
    f = max(
        (p for p in dest.iterdir() if p.name.endswith(".parquet")),
        key=lambda p: p.stat().st_size,
    )
    orig = f.read_bytes()
    ref = sorted(map(tuple, spark.read.parquet(str(f)).collect()))
    rnd = random.Random(11)
    caught = 0
    for trial in range(6):
        data = bytearray(orig)
        data[rnd.randrange(1000, len(orig) - 2000)] ^= 0xFF
        fd = tmp_path / f"ingest_flip{trial}"
        fd.mkdir()
        (fd / "part-0.parquet").write_bytes(bytes(data))
        try:
            got = sorted(map(tuple, spark.read.parquet(str(fd)).collect()))
            if got != ref:
                pytest.fail(f"trial {trial}: flip silently altered ingested copy")
        except Exception:
            caught += 1
    assert caught >= 1


def test_orc_file_quarantine_and_ingest(spark, tmp_path):
    """The file-grain quarantine generalizes to ORC (the other
    footer-carrying columnar format honoring per-relation
    ignoreCorruptFiles): truncated parts are dropped and reported, and
    ingest_untrusted(fmt='orc') re-encodes the survivors into verified
    parquet with a reconciled report."""
    from nbi_oedi_etl_spark.sources import ingest_untrusted, read_with_quarantine

    src = tmp_path / "orc_in"
    spark.range(0, 5000).selectExpr("id", "id * 3 as v").coalesce(1).write.orc(
        str(src)
    )
    good = next(p for p in src.iterdir() if p.name.endswith(".orc"))
    data = good.read_bytes()
    (src / "corrupt-truncated.orc").write_bytes(data[: len(data) // 2])
    parts = sorted(str(p) for p in src.iterdir() if p.name.endswith(".orc"))

    # default scan fails loudly
    with pytest.raises(Exception):
        spark.read.orc(str(src)).count()
    # drop-and-report
    df, rep = read_with_quarantine(spark, parts, fmt="orc")
    assert [pathlib.Path(p).name for p in rep.quarantined] == [
        "corrupt-truncated.orc"
    ]
    assert df.count() == 5000
    # trust-boundary re-encode into verified parquet
    irep = ingest_untrusted(spark, parts, str(tmp_path / "out"), fmt="orc")
    assert irep.reconciled and irep.rows_read == irep.rows_written == 5000
    assert [pathlib.Path(p).name for p in irep.files.quarantined] == [
        "corrupt-truncated.orc"
    ]


def test_streaming_source_fails_loudly_on_corrupt_file(spark, tmp_path):
    """Anti-silent-loss at the STREAMING tier: a corrupt parquet part in a
    table directory must abort the availableNow drain, never stream a
    silent subset. (The batch half of this contract is pinned above; the
    stream source shares spark.sql.files.ignoreCorruptFiles=false
    defaults.)"""
    from nbi_oedi_etl_spark.streaming.ingest import table_file_stream

    for t in fault_sweep._tables():
        d = tmp_path / f"{t}.parquet"
        d.mkdir()
        shutil.copyfile(f"{SF}/{t}.parquet", d / "part-00000.parquet")
    events = tmp_path / "events.parquet"
    data = (events / "part-00000.parquet").read_bytes()
    (events / "corrupt-truncated.parquet").write_bytes(data[: len(data) // 2])

    # a loud failure at ANY stage (schema probe on the corrupt footer, or
    # the drain itself) satisfies the contract — what must NOT happen is a
    # completed drain over a silent subset
    with pytest.raises(Exception):
        stream = table_file_stream(spark, str(tmp_path), "events")
        q = (
            stream.groupBy("event_type")
            .count()
            .writeStream.format("memory")
            .queryName("corrupt_stream_probe")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option(
                "checkpointLocation", str(tmp_path / "ckpt_corrupt_stream_probe")
            )
            .start()
        )
        q.awaitTermination()


def test_ingest_untrusted_records_csv_to_verified_parquet(spark, tmp_path):
    """Row-grain trust boundary: an untrusted CSV drop becomes CRC-verified
    warehouse parquet; malformed lines land in the quarantine frame with
    raw text; clean rows in == rows written."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from nbi_oedi_etl_spark.sources import ingest_untrusted_records

    d = tmp_path / "drop"
    d.mkdir()
    (d / "part-0.csv").write_text(
        "k,v\n1,alpha\n2,beta\nnot-a-number,gamma\n4,delta\n"
    )
    schema = StructType(
        [StructField("k", LongType()), StructField("v", StringType())]
    )
    rep = ingest_untrusted_records(
        spark, str(d), schema, str(tmp_path / "out"), fmt="csv"
    )
    assert rep.rows_clean == rep.rows_written == 3
    assert rep.rows_quarantined == 1
    assert rep.reconciled
    assert [r["raw_record"] for r in rep.quarantined_df.collect()] == [
        "not-a-number,gamma"
    ]
    got = sorted(
        (r["k"], r["v"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == [(1, "alpha"), (2, "beta"), (4, "delta")]


def test_ingest_untrusted_never_shadows_input_columns(spark, tmp_path):
    """The internal file-tagging column must not overwrite a real input
    column that happens to share its name."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nbi_oedi_etl_spark.sources import ingest_untrusted

    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(
        pa.table({"k": [1, 2, 3], "_src_file": ["a", "b", "c"]}),
        src / "p.parquet",
    )
    rep = ingest_untrusted(spark, [str(src / "p.parquet")], str(tmp_path / "out"))
    rows = sorted(
        (r["k"], r["_src_file"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert rows == [(1, "a"), (2, "b"), (3, "c")]
    assert rep.reconciled and rep.rows_read == 3


def test_page_crc_catches_silent_bitflip(spark, tmp_path):
    """Engine-written parquet carries page CRC32s and the session verifies
    them (both confs on in session.py): a mid-page bit flip that survives
    snappy decompression must fail LOUDLY, not silently alter values.
    Measured in r8: 25/25 silent flips caught with verify on, 0/25 off."""
    import random

    hc = spark.sparkContext._jsc.hadoopConfiguration()
    assert hc.get("parquet.page.write-checksum.enabled") == "true"
    assert hc.get("parquet.page.verify-checksum.enabled") == "true"

    out = tmp_path / "t"
    spark.range(0, 200_000).selectExpr("id", "id*7 as v").coalesce(1).write.parquet(
        str(out)
    )
    f = next(p for p in out.iterdir() if p.name.endswith(".parquet"))
    orig = f.read_bytes()
    ref = sorted(map(tuple, spark.read.parquet(str(out)).collect()))
    rnd = random.Random(7)
    caught = loud = equal = 0
    for trial in range(10):
        data = bytearray(orig)
        data[rnd.randrange(1000, len(orig) - 2000)] ^= 0xFF
        fd = tmp_path / f"flip{trial}"
        fd.mkdir()
        (fd / "part-0.parquet").write_bytes(bytes(data))
        try:
            got = sorted(map(tuple, spark.read.parquet(str(fd)).collect()))
            if got == ref:
                equal += 1  # flip landed in dead bytes (padding/footer slack)
            else:
                pytest.fail(f"trial {trial}: bit flip silently altered values")
        except Exception:
            caught += 1
    assert caught >= 1  # at least some flips must land in verified pages


# ------------------------------------------------------------ codecs

_FAMS = fault_sweep._adversarial_payloads()


@pytest.mark.parametrize("fam", sorted(_FAMS))
def test_adversarial_payloads_quarantine_in_bounded_time(fam):
    """Every adversarial payload must raise ValueError (or the documented
    NotImplementedError) within the budget — never MemoryError, never a
    wrong-type crash, never a hang. DECODED is allowed only for
    truncation prefixes that happen to be complete streams."""
    decode = mm.decode_wav if fam == "wav" else mm.decode_image_real
    for i, payload in enumerate(_FAMS[fam]):
        t0 = time.monotonic()
        try:
            decode(payload)
        except (ValueError, NotImplementedError):
            pass
        dt = time.monotonic() - t0
        assert dt <= fault_sweep.TIME_BUDGET_S, f"{fam} case {i}: {dt:.2f}s"


def test_wav_query_surface_quarantines_per_row(spark):
    """extract_wav_features crashed the job on undecodable payloads before
    r8 (found by the sweep); now it must emit decoded_ok=False rows."""
    cases = [p for p in _FAMS["wav"][:20] if p]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(cases)),
            "payload": cases,
            "mime": ["audio/wav"] * len(cases),
        }
    )
    rows = {r["doc_id"]: r for r in mm.extract_wav_features(spark.createDataFrame(pdf)).collect()}
    assert len(rows) == len(cases)
    for i, payload in enumerate(cases):
        try:
            mm.decode_wav(payload)
            direct_ok = True
        except (ValueError, NotImplementedError):
            direct_ok = False
        assert rows[i]["decoded_ok"] is direct_ok
        if not direct_ok:
            assert rows[i]["sum_abs_amplitude"] is None
    # at least the magic-only and cyclic cases must quarantine
    assert any(not r["decoded_ok"] for r in rows.values())


def test_image_query_surface_quarantines_per_row(spark):
    cases = [p for fam in ("png", "bmp", "jpeg", "webp") for p in _FAMS[fam][:3] if p]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(cases)),
            "payload": cases,
            "mime": ["application/octet-stream"] * len(cases),
        }
    )
    rows = mm.extract_image_features(spark.createDataFrame(pdf)).collect()
    assert len(rows) == len(cases)
    assert all(not r["decoded_ok"] for r in rows)


def test_resize_drops_undecodable_rows(spark):
    """resize_bmp_images crashed on corrupt payloads before r8; now it
    drops the row (reference log-and-drop) and keeps the good ones."""
    good = mm.encode_bmp(4, 3, bytes(range(36)))
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "payload": [good, b"BMgarbage", good[: len(good) // 2]],
            "mime": ["image/bmp"] * 3,
        }
    )
    rows = mm.resize_bmp_images(spark.createDataFrame(pdf), 2, 2).collect()
    assert [r["doc_id"] for r in rows] == [1]


# ------------------------------------------------- r9 quarantine hardening


def test_quarantine_handles_percent_encoded_paths(spark, tmp_path):
    """ADVICE r8: input_file_name() returns percent-encoded file URIs;
    listed paths with spaces/unicode must still match instead of being
    falsely reported quarantined."""
    weird = tmp_path / "a b ü.parquet"
    pd.DataFrame({"x": [1, 2, 3]}).to_parquet(weird, index=False)
    df, rep = read_with_quarantine(spark, [str(weird)])
    assert df.count() == 3
    assert rep.quarantined == []
    assert rep.readable == [str(weird)]


def test_quarantine_report_fills_from_callers_action(spark, tmp_path):
    """VERDICT r8 task 5 (one-scan): with trust_first_action=True, after
    the caller runs a full action on the returned frame, the report
    materializes from the piggybacked observation — no detection job of
    its own."""
    p = tmp_path / "t.parquet"
    pd.DataFrame({"x": list(range(10))}).to_parquet(p, index=False)
    df, rep = read_with_quarantine(spark, [str(p)], trust_first_action=True)
    assert not rep._observation_filled()
    assert df.count() == 10  # the caller's own consumption
    assert rep._observation_filled()  # ...was the detection scan
    assert rep.quarantined == [] and len(rep.readable) == 1


def test_quarantine_default_report_correct_after_partial_action(spark, tmp_path):
    """r9 self-review regression: a partial first action (limit/take)
    fills an Observation with partial metrics. The DEFAULT report must be
    immune — it runs its own detection pass and reports both files
    readable even though the caller's first action touched only one."""
    a, b = tmp_path / "a.parquet", tmp_path / "b.parquet"
    pd.DataFrame({"x": [1, 2, 3]}).to_parquet(a, index=False)
    pd.DataFrame({"x": [4, 5, 6]}).to_parquet(b, index=False)
    df, rep = read_with_quarantine(spark, [str(a), str(b)])
    assert len(df.limit(1).collect()) == 1  # partial first action
    assert rep.quarantined == []
    assert len(rep.readable) == 2


def test_ingest_untrusted_reconciles_under_append(spark, tmp_path):
    """ADVICE r8: rows_written must be the write's delta, not a recount
    of dest — append onto pre-existing data reconciles."""
    from nbi_oedi_etl_spark.sources import ingest_untrusted

    src = tmp_path / "src.parquet"
    pd.DataFrame({"x": list(range(7))}).to_parquet(src, index=False)
    dest = str(tmp_path / "out")
    rep1 = ingest_untrusted(spark, [str(src)], dest, mode="append")
    rep2 = ingest_untrusted(spark, [str(src)], dest, mode="append")
    assert rep1.reconciled and rep1.rows_written == 7
    assert rep2.reconciled and rep2.rows_written == 7
    assert spark.read.parquet(dest).count() == 14


def test_ingest_untrusted_records_frees_cache_and_keeps_quarantine(spark, tmp_path):
    """ADVICE r8: the PERMISSIVE split cache must not outlive the call;
    the quarantine frame stays queryable (localCheckpoint-backed) and
    append-mode reconciliation uses the write delta."""
    from pyspark.sql.types import LongType, StructField, StructType

    from nbi_oedi_etl_spark.sources.formats import ingest_untrusted_records

    src = tmp_path / "in.csv"
    src.write_text("a,b\n1,2\n3,4\nnot,a,number,row\n5,6\n")
    schema = StructType([StructField("a", LongType()), StructField("b", LongType())])
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    empty_before = cache_mgr.isEmpty()
    dest = str(tmp_path / "out")
    rep = ingest_untrusted_records(spark, str(src), schema, dest, fmt="csv", mode="append")
    assert rep.rows_clean == 3 and rep.rows_quarantined == 1 and rep.reconciled
    # the full-width PERMISSIVE df.cache() entry is gone from the SQL
    # cache manager (the quarantine localCheckpoint lives in RDD-block
    # storage, deliberately — it is the small side)
    if empty_before:
        assert cache_mgr.isEmpty()
    # quarantine frame survives the unpersist and carries the raw text
    assert rep.quarantined_df.collect()[0]["raw_record"].startswith("not,a,number")
    # append onto existing data still reconciles
    rep2 = ingest_untrusted_records(spark, str(src), schema, dest, fmt="csv", mode="append")
    assert rep2.reconciled and rep2.rows_written == 3
    assert spark.read.parquet(dest).count() == 6


def _run_with_deadline(fn, seconds=120):
    """Run fn in a thread; fail the test instead of hanging the suite if
    it never returns (the ADVICE r9 obs.get-blocks-forever failure mode)."""
    import threading

    out: list = []
    t = threading.Thread(target=lambda: out.append(fn()), daemon=True)
    t.start()
    t.join(seconds)
    assert out, f"call did not return within {seconds}s (observation hang?)"
    return out[0]


def test_ingest_untrusted_ignore_mode_skips_without_hang(spark, tmp_path):
    """ADVICE r9 (medium): SaveMode.Ignore with an existing destination
    runs NO job, so the piggybacked Observation never fills — the call
    must short-circuit with a faithful skip report, not block forever."""
    from nbi_oedi_etl_spark.sources import ingest_untrusted

    src = tmp_path / "src.parquet"
    pd.DataFrame({"x": list(range(5))}).to_parquet(src, index=False)
    dest = str(tmp_path / "out")
    rep1 = ingest_untrusted(spark, [str(src)], dest, mode="ignore")
    # fresh dest: ignore behaves like a normal write
    assert rep1.reconciled and rep1.rows_written == 5
    rep2 = _run_with_deadline(
        lambda: ingest_untrusted(spark, [str(src)], dest, mode="ignore")
    )
    # existing dest: nothing written, and the report SAYS so
    assert rep2.rows_written == 0 and rep2.rows_read == 5
    assert not rep2.reconciled
    assert rep2.files.quarantined == [] and len(rep2.files.readable) == 1
    assert spark.read.parquet(dest).count() == 5  # dest untouched


def test_ingest_untrusted_records_ignore_mode_skips_without_hang(spark, tmp_path):
    """The CSV/JSON sibling of the ignore-mode hang (quarantine cache
    unpersist must still run — it sits in the finally the hang skipped)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from nbi_oedi_etl_spark.sources.formats import ingest_untrusted_records

    src = tmp_path / "in.csv"
    src.write_text("a,b\n1,2\nbad,row,extra\n3,4\n")
    schema = StructType([StructField("a", LongType()), StructField("b", LongType())])
    dest = str(tmp_path / "out")
    rep1 = ingest_untrusted_records(spark, str(src), schema, dest, fmt="csv", mode="ignore")
    assert rep1.reconciled and rep1.rows_written == 2
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    empty_before = cache_mgr.isEmpty()
    rep2 = _run_with_deadline(
        lambda: ingest_untrusted_records(
            spark, str(src), schema, dest, fmt="csv", mode="ignore"
        )
    )
    assert rep2.rows_written == 0 and rep2.rows_clean == 2
    assert rep2.rows_quarantined == 1 and not rep2.reconciled
    assert rep2.quarantined_df.count() == 1  # still queryable post-unpersist
    if empty_before:
        assert cache_mgr.isEmpty()  # the finally ran on the skip path too
    assert spark.read.parquet(dest).count() == 2  # dest untouched


def test_quarantine_refresh_repairs_poisoned_trusted_report(spark, tmp_path):
    """ADVICE r9: with trust_first_action=True a partial first action
    (limit) poisons the observation permanently; refresh() must drop it
    and answer from the always-correct detection pass."""
    a, b = tmp_path / "a.parquet", tmp_path / "b.parquet"
    pd.DataFrame({"x": [1, 2, 3]}).to_parquet(a, index=False)
    pd.DataFrame({"x": [4, 5, 6]}).to_parquet(b, index=False)
    df, rep = read_with_quarantine(spark, [str(a), str(b)], trust_first_action=True)
    assert len(df.limit(1).collect()) == 1  # partial first action: hazard
    poisoned = rep.readable
    assert len(rep.refresh().readable) == 2  # correct regardless of poison
    assert rep.quarantined == []
    del poisoned  # value depends on which partition limit(1) touched


def test_probe_schema_bounded_on_mostly_corrupt_listing(spark, tmp_path):
    """VERDICT r9 task 6: schema discovery over a mostly-corrupt listing
    must probe a bounded, evenly-spaced sample (first+last included) —
    not crawl O(files) driver round-trips — and fail loudly with counts
    when no sampled footer is readable."""
    from nbi_oedi_etl_spark.sources.quarantine import (
        _MAX_SCHEMA_PROBES,
        _probe_schema,
    )

    good = tmp_path / "good.parquet"
    pd.DataFrame({"x": [1]}).to_parquet(good, index=False)
    corrupt = []
    for i in range(100):
        p = tmp_path / f"bad-{i:03d}.parquet"
        p.write_bytes(b"PAR1 this is not parquet")
        corrupt.append(str(p))
    # readable file LAST: found because the sample always includes the
    # tail, with <= _MAX_SCHEMA_PROBES probes instead of 101
    schema = _probe_schema(spark, corrupt + [str(good)])
    assert [f.name for f in schema.fields] == ["x"]
    with pytest.raises(ValueError, match=rf"{_MAX_SCHEMA_PROBES} probed of 100"):
        _probe_schema(spark, corrupt)


def test_probe_schema_max_probes_parameter(spark, tmp_path):
    """ADVICE r10: the probe cap is a per-call parameter — a listing whose
    only readable file falls between default sample points succeeds when
    the caller raises max_probes, instead of requiring a re-list."""
    from nbi_oedi_etl_spark.sources.quarantine import _probe_schema

    corrupt = []
    for i in range(100):
        p = tmp_path / f"bad-{i:03d}.parquet"
        p.write_bytes(b"PAR1 this is not parquet")
        corrupt.append(str(p))
    good = tmp_path / "bad-050x.parquet"  # sorts between sample points
    pd.DataFrame({"x": [1]}).to_parquet(good, index=False)
    paths = sorted(corrupt + [str(good)])
    # default cap 16 over 101 files probes every ~6th: craft a miss by
    # checking which indexes are sampled, then verify the widened pass
    idx = paths.index(str(good))
    step = (len(paths) - 1) / 15
    sampled = {round(i * step) for i in range(16)}
    if idx in sampled:  # unlucky placement: shift the good file's name
        good2 = tmp_path / "bad-050y.parquet"
        good.rename(good2)
        paths = sorted(corrupt + [str(good2)])
        idx = paths.index(str(good2))
    assert idx not in sampled
    with pytest.raises(ValueError, match="max_probes"):
        _probe_schema(spark, paths)
    schema = _probe_schema(spark, paths, max_probes=len(paths))
    assert [f.name for f in schema.fields] == ["x"]
    with pytest.raises(ValueError, match="max_probes must be >= 2"):
        _probe_schema(spark, paths, max_probes=1)


def test_ingest_untrusted_survives_ignore_mode_race(spark, tmp_path, monkeypatch):
    """ADVICE r10: if dest is created by a concurrent writer between the
    exists-check and the write, SaveMode.Ignore runs no job — the ingest
    must degrade to the skip report (rows_written=0), not hang on
    obs.get. Simulated by forcing the exists-check to say False while
    dest already exists."""
    from nbi_oedi_etl_spark.sources import quarantine as q

    src = tmp_path / "in.parquet"
    pd.DataFrame({"x": [1, 2, 3]}).to_parquet(src, index=False)
    dest = tmp_path / "dest"
    # dest pre-populated: the "concurrent writer"
    spark.createDataFrame([(99,)], "x int").write.parquet(str(dest))

    monkeypatch.setattr(q, "_dest_exists", lambda *_: False)
    rep = q.ingest_untrusted(spark, [str(src)], str(dest), mode="ignore")
    assert rep.rows_read == 3
    assert rep.rows_written == 0
    assert not rep.reconciled
    # dest untouched: still the concurrent writer's single row
    assert spark.read.parquet(str(dest)).count() == 1


def test_ingest_untrusted_records_survives_ignore_mode_race(
    spark, tmp_path, monkeypatch
):
    """Same race, text-format sibling (formats.py)."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    from nbi_oedi_etl_spark.sources import quarantine as q
    from nbi_oedi_etl_spark.sources.formats import ingest_untrusted_records

    src = tmp_path / "in.csv"
    src.write_text("a,b\n1,2\n3,4\n")
    dest = tmp_path / "dest"
    spark.createDataFrame([(99, 99)], "a int, b int").write.parquet(str(dest))

    monkeypatch.setattr(q, "_dest_exists", lambda *_: False)
    schema = StructType(
        [StructField("a", IntegerType()), StructField("b", IntegerType())]
    )
    rep = ingest_untrusted_records(
        spark, str(src), schema, str(dest), fmt="csv", mode="ignore"
    )
    assert rep.rows_clean == 2
    assert rep.rows_written == 0
    assert spark.read.parquet(str(dest)).count() == 1
