"""Per-file failure isolation (SURVEY.md §7.4.7).

The reference logs-and-drops files that fail transformation
(transform.py:168-170) and surfaces them in the discrepancy report
(monitor.py:87-106, e.g. the 5790-1.parquet case README.md:352-361). Spark
fails the whole job on a corrupt file by default — the right default for a
warehouse — so drop-and-report is OPT-IN here:

1. read with a per-relation ``ignoreCorruptFiles`` option,
2. learn which listed files actually produced rows — by default via one
   column-pruned detection pass at report-access time (always correct);
   with ``trust_first_action=True`` via an ``observe`` piggyback on the
   caller's own first action (zero extra jobs, contract below),
3. return (DataFrame, quarantine report).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class QuarantineReport:
    listed: list[str]
    readable: list[str]
    quarantined: list[str]


#: Footer-carrying columnar formats the file-grain quarantine supports —
#: both honor the per-relation ``ignoreCorruptFiles`` option.
_FILE_FORMATS = ("parquet", "orc")

_URI_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")


#: Default cap on serial driver-side footer probes during schema
#: discovery — a mostly-corrupt directory previously cost O(files)
#: driver round-trips before erroring (VERDICT r9 task 6). Callers with
#: known mostly-corrupt listings can raise it per call via the
#: ``max_probes`` parameter threaded through the public APIs (ADVICE
#: r10: the cap is a parameter, not a module constant to monkeypatch).
_MAX_SCHEMA_PROBES = 16


def _probe_schema(
    spark: SparkSession,
    paths: list[str],
    fmt: str = "parquet",
    max_probes: int = _MAX_SCHEMA_PROBES,
):
    # Schema inference reads EVERY footer and fails before
    # ignoreCorruptFiles can apply at task level — probe a BOUNDED,
    # evenly-spaced sample of the listing for one readable footer and
    # scan with that explicit schema instead. The sample always includes
    # the first and last path; a listing whose only readable files all
    # fall between sample points now fails loudly with the probe count
    # instead of being found by an O(files) serial crawl — retry with a
    # larger ``max_probes`` (the error says so) or probe a readable file
    # directly.
    if fmt not in _FILE_FORMATS:
        raise ValueError(f"unsupported columnar format: {fmt!r} {_FILE_FORMATS}")
    if max_probes < 2:
        raise ValueError(f"max_probes must be >= 2, got {max_probes}")
    if len(paths) <= max_probes:
        sample = list(paths)
    else:
        step = (len(paths) - 1) / (max_probes - 1)
        sample = [paths[round(i * step)] for i in range(max_probes)]
    for p in sample:
        try:
            return spark.read.format(fmt).load(p).schema
        except Exception:
            continue
    raise ValueError(
        f"no readable {fmt} footer among {len(sample)} probed of "
        f"{len(paths)} listed files (probe cap {max_probes}; retry with "
        f"a larger max_probes if readable files may sit between sample "
        f"points)"
    )


def _observation_filled(obs) -> bool | None:
    """Whether an Observation's action actually ran: True/False via the
    non-public JVM probe (classic mode), None when the probe is
    unavailable (Spark Connect). Callers use this to avoid blocking
    forever on ``obs.get`` after a write that may have been a
    SaveMode.Ignore no-op (ADVICE r10: the exists-then-write race)."""
    try:
        return not obs._jo.getRowOrEmpty().isEmpty()
    except Exception:
        return None


def _normalize(path: str) -> str:
    """Canonicalize a path for listed-vs-readable comparison.

    ``input_file_name()`` returns a percent-encoded ``file:`` URI while
    callers list raw local paths — decode the URI form (scheme stripped
    for ``file:``, kept for remote filesystems) so paths with spaces or
    non-ASCII characters match instead of being falsely reported
    quarantined (ADVICE r8). Only strings that actually LOOK like URIs
    are parsed — a ``file:`` prefix or a ``scheme://`` head; anything
    else is taken literally, so a raw local path whose first segment
    contains a colon (``odd:name/x.parquet``) or a literal ``%20`` is
    not mangled (r9 self-review)."""
    if path.startswith("file:"):
        return unquote(urlparse(path).path)
    if _URI_SCHEME_RE.match(path):
        parsed = urlparse(path)
        return f"{parsed.scheme}://{parsed.netloc}{unquote(parsed.path)}"
    return path


class LazyQuarantineReport:
    """File-grain quarantine report with two freshness sources.

    Default (``trust_first_action=False``): accessing ``readable`` /
    ``quarantined`` runs ONE column-pruned detection pass (for parquet /
    ORC the scan reads row-group metadata, no column data) and caches the
    result. Always correct, independent of what actions the caller ran —
    the pre-r9 eager behavior, made lazy so callers that never read the
    report never pay for it.

    Opt-in (``trust_first_action=True``): the report fills from the
    observe piggyback on the caller's FIRST action over the returned
    DataFrame — zero extra jobs for the read→transform→write shape.
    CONTRACT: Spark observations record the first action ONLY, so that
    first action must be a FULL one (count/collect/write). If it is
    partial — ``limit``/``take``/``show`` — the observation reflects only
    the partitions that action touched and the report will be wrong;
    there is no way to detect this from the report side, which is why
    correctness-by-default lives in the other mode (r9 self-review: a
    partial first action previously poisoned the report permanently).

    Duck-typed to ``QuarantineReport`` (listed/readable/quarantined).
    """

    def __init__(
        self,
        obs,
        observed_df: DataFrame | None,
        detect_df: DataFrame,
        listed: list[str],
    ) -> None:
        # obs is None in the default (detection-pass) mode; its presence
        # IS the trust_first_action flag — no separate boolean can then
        # disagree with it.
        self._obs = obs
        self._observed_df = observed_df
        self._detect_df = detect_df
        self.listed = listed
        self._readable: list[str] | None = None

    def _observation_filled(self) -> bool:
        # None (probe unavailable) degrades to one redundant-but-correct
        # count() below, same as False.
        return _observation_filled(self._obs) is True

    def _files(self) -> list[str]:
        if self._obs is not None:
            if not self._observation_filled():
                # No action yet: run the (full) detection count ourselves,
                # filling the observation. If an action DID already run and
                # the probe just failed (Connect), this count is redundant
                # but harmless — obs.get returns the first action's metrics.
                self._observed_df.count()
            return list(self._obs.get["files"])
        # Correct-by-default: our own pass over an UN-observed twin of the
        # plan — immune to whatever (possibly partial) actions the caller
        # ran. Column-pruned: only input_file_name survives projection.
        return [
            r["f"]
            for r in self._detect_df.select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        ]

    @property
    def readable(self) -> list[str]:
        if self._readable is None:
            self._readable = sorted(_normalize(p) for p in self._files())
        return self._readable

    @property
    def quarantined(self) -> list[str]:
        return sorted(set(self.listed) - set(self.readable))

    def refresh(self) -> "LazyQuarantineReport":
        """Escape hatch for the ``trust_first_action`` hazard (ADVICE r9):
        drop the observation AND any cached answer, so every later access
        runs the always-correct column-pruned detection pass — use after a
        partial first action (limit/take/show) may have poisoned the
        observed metrics, which is undetectable from the report side.
        Returns self for chaining."""
        self._obs = None
        self._observed_df = None
        self._readable = None
        return self


def _quarantine_scan(
    spark: SparkSession,
    paths: list[str],
    fmt: str,
    max_probes: int = _MAX_SCHEMA_PROBES,
) -> DataFrame:
    """Per-relation ignoreCorruptFiles scan (not the session conf): the
    returned DataFrame must keep its drop-semantics across later actions
    without leaking a session-wide corrupt-files policy. Multi-path reads
    go through format().load(list) — PySpark's varargs
    DataFrameReader.orc(p1, p2) is broken in this build
    (IllegalArgumentException without a schema; SILENTLY reads only the
    first path with one), measured while adding ORC support."""
    schema = _probe_schema(spark, paths, fmt, max_probes)
    return (
        spark.read.schema(schema)
        .option("ignoreCorruptFiles", "true")
        .format(fmt)
        .load(list(paths))
    )


def _observe_files(df: DataFrame):
    """Attach an Observation collecting (row count, distinct source
    files) to ``df``; returns (observed_df, observation)."""
    from pyspark.sql.observation import Observation

    src_col = "_src_file"
    while src_col in df.columns:  # never shadow a real input column
        src_col += "_"
    obs = Observation()
    observed = (
        df.withColumn(src_col, F.input_file_name())
        .observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            # materialized as a column first: InputFileName cannot be
            # evaluated inside observe's accumulator
            F.collect_set(src_col).alias("files"),
        )
        .drop(src_col)
    )
    return observed, obs


def read_with_quarantine(
    spark: SparkSession,
    paths: list[str],
    fmt: str = "parquet",
    trust_first_action: bool = False,
    max_probes: int = _MAX_SCHEMA_PROBES,
) -> tuple[DataFrame, LazyQuarantineReport]:
    """Read parquet (or ORC) files, dropping unreadable ones with a report
    instead of failing the job (reference drop-and-report semantics).

    Pass structure: by default the report costs one column-pruned
    detection pass at first access (metadata-scale for columnar formats)
    and the returned DataFrame carries zero instrumentation overhead.
    With ``trust_first_action=True`` the report instead fills from the
    caller's first FULL action (``observe`` piggyback — one job total for
    the read→consume shape; VERDICT r8 task 5); see
    ``LazyQuarantineReport`` for the contract and its hazard. The
    self-contained ``ingest_untrusted`` always uses the piggyback — it
    controls the action (a full write).

    Contract note (shared with ``ingest_untrusted``): a VALID file with
    zero rows yields no rows, so it is reported quarantined — at row
    grain, "contributed nothing" and "unreadable" are the same
    observation. Treat the quarantine list as drop-AND-REPORT; inspect
    before deleting.
    """
    df = _quarantine_scan(spark, paths, fmt, max_probes)
    listed = sorted(_normalize(p) for p in paths)
    if trust_first_action:
        observed, obs = _observe_files(df)
        return observed, LazyQuarantineReport(obs, observed, df, listed)
    return df, LazyQuarantineReport(None, None, df, listed)


@dataclass
class IngestReport:
    """Outcome of one ``ingest_untrusted`` run — the engine's analogue of
    the reference's per-run discrepancy report (monitor.py:87-136): what was
    listed, what was dropped, and whether input and output rows reconcile."""

    files: QuarantineReport
    rows_read: int
    rows_written: int

    @property
    def reconciled(self) -> bool:
        return self.rows_read == self.rows_written


def _dest_exists(spark: SparkSession, dest: str) -> bool:
    """True when the destination path exists at all — SaveMode.Ignore
    no-ops on path EXISTENCE, not on parquet-ness, so this (not a read
    probe) is the condition that predicts the skipped write."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(dest)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def _dest_row_count(spark: SparkSession, dest: str) -> int:
    """Footer/statistics-level row count of a parquet destination; 0 only
    when the path does not exist yet (pre-write baseline for
    mode='append'). Any OTHER failure propagates — swallowing it would
    silently corrupt the reconciliation instead of failing loudly
    (r9 self-review)."""
    from pyspark.errors import AnalysisException

    try:
        return int(spark.read.parquet(dest).count())
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return 0
        raise


def ingest_untrusted(
    spark: SparkSession,
    paths: list[str],
    dest: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "error",
    fmt: str = "parquet",
    max_probes: int = _MAX_SCHEMA_PROBES,
) -> IngestReport:
    """Trust boundary for external parquet (or ORC): quarantine unreadable files,
    re-encode the survivors through the engine's page-CRC-checksummed sink,
    and reconcile row counts in vs out.

    Why this exists: the r8 fault sweep measured that a mid-page bit flip
    in CRC-less external parquet (e.g. pyarrow defaults) can SILENTLY alter
    values — Spark only verifies page checksums that are present. Engine
    writes carry CRC32s (session.py ``parquet.page.write-checksum``), so
    one defensive re-encode at the trust boundary upgrades all downstream
    reads to verified pages. Mirrors the reference's fetch→transform→
    upload→reconcile loop (etl_job.py stage counters; the listed-vs-
    uploaded diff of monitor.py:87-106) at the ingestion edge.

    Pass structure at 100 TB: ONE full scan total. The schema probe reads
    at most a few footers (metadata-scale); the quarantine file report and
    the input row count are both computed DURING the re-encode write job
    (``observe`` — safe here because this function controls the action
    and a write is always full), so no separate detection pass runs.
    ``rows_written`` is the DELTA of the destination's footer-level row
    count across the write (pre-count 0 when dest is new or
    mode='overwrite'), so reconciliation is correct under mode='append'
    onto pre-existing data too (ADVICE r8). The collected file list is
    driver-side metadata-scale (~one string per input file — the same
    bound every file-listing step already carries).

    Contract note (shared with ``read_with_quarantine``): a VALID file
    with zero rows yields no rows, so it is reported quarantined — at
    row grain, "contributed nothing" and "unreadable" are the same
    observation. No rows are lost either way; treat the quarantine list
    as drop-AND-REPORT, inspect before deleting.
    """
    from nbi_oedi_etl_spark.sources.sinks import write_parquet

    def _skipped_report() -> IngestReport:
        # SaveMode.Ignore with an existing destination runs NO job, so an
        # attached Observation would never fill and ``obs.get`` would
        # block forever (ADVICE r9). Report the skip faithfully instead:
        # one column-pruned detection pass fills the file report and the
        # input row count; rows_written=0 so ``reconciled`` is False for
        # any non-empty input — the caller sees nothing was ingested.
        scan = _quarantine_scan(spark, paths, fmt, max_probes)
        # input_file_name() materialized as a column first — it cannot be
        # evaluated inside an aggregate (same constraint as _observe_files)
        agg = (
            scan.select(F.input_file_name().alias("_src_file"))
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.collect_set("_src_file").alias("files"),
            )
            .collect()[0]
        )
        listed = sorted(_normalize(p) for p in paths)
        readable = sorted(_normalize(p) for p in (agg["files"] or []))
        quarantined = sorted(set(listed) - set(readable))
        return IngestReport(
            QuarantineReport(listed, readable, quarantined), int(agg["rows"]), 0
        )

    if mode == "ignore" and _dest_exists(spark, dest):
        return _skipped_report()

    observed, obs = _observe_files(_quarantine_scan(spark, paths, fmt, max_probes))
    # pre-count only when pre-existing rows can survive the write:
    # mode='error' fails on an existing dest and 'overwrite' replaces it,
    # so both start from 0 without touching dest (the ignore+existing-dest
    # case short-circuited above; reaching here with 'ignore' means dest
    # does not exist yet and the write behaves like 'error'-on-fresh)
    pre_rows = _dest_row_count(spark, dest) if mode == "append" else 0
    # Check-then-act race (ADVICE r10): dest may be created by a
    # concurrent writer between the _dest_exists check above and the
    # write. SaveMode.Ignore would then run NO real job — and this Spark
    # build fills the observation with ZEROS on the no-op, so the report
    # would silently claim every file quarantined and count the
    # concurrent writer's rows as ours. Act-and-catch instead: on a
    # fresh dest, 'ignore' behaves exactly like 'error', so write with
    # 'error' and translate a lost race into the faithful skip report.
    try:
        write_parquet(
            observed, dest, partition_by=partition_by,
            mode="error" if mode == "ignore" else mode,
        )
    except Exception as e:  # AnalysisException [PATH_ALREADY_EXISTS]
        if mode == "ignore" and "ALREADY_EXISTS" in str(e).upper():
            return _skipped_report()
        raise
    rows_read = int(obs.get["rows"])
    readable = sorted(_normalize(p) for p in obs.get["files"])
    listed = sorted(_normalize(p) for p in paths)
    quarantined = sorted(set(listed) - set(readable))
    rows_written = _dest_row_count(spark, dest) - pre_rows
    return IngestReport(
        QuarantineReport(listed, readable, quarantined), rows_read, rows_written
    )
