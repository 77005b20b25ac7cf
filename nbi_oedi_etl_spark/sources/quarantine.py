"""Per-file failure isolation (SURVEY.md §7.4.7).

The reference logs-and-drops files that fail transformation
(transform.py:168-170) and surfaces them in the discrepancy report
(monitor.py:87-106, e.g. the 5790-1.parquet case README.md:352-361). Spark
fails the whole job on a corrupt file by default — the right default for a
warehouse — so drop-and-report is OPT-IN here:

1. read with a per-relation ``ignoreCorruptFiles`` option,
2. learn which listed files actually produced rows from the SAME scan the
   caller runs (``observe`` piggyback — the listed-vs-uploaded
   reconciliation of the reference applied to inputs, at zero extra jobs),
3. return (DataFrame, quarantine report).
"""

from __future__ import annotations

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


def _probe_schema(spark: SparkSession, paths: list[str], fmt: str = "parquet"):
    # Schema inference reads EVERY footer and fails before
    # ignoreCorruptFiles can apply at task level — probe for the first
    # readable footer and scan with an explicit schema instead.
    if fmt not in _FILE_FORMATS:
        raise ValueError(f"unsupported columnar format: {fmt!r} {_FILE_FORMATS}")
    for p in paths:
        try:
            return spark.read.format(fmt).load(p).schema
        except Exception:
            continue
    raise ValueError(f"no readable {fmt} file among inputs")


def _normalize(path: str) -> str:
    """Canonicalize a path for listed-vs-readable comparison.

    ``input_file_name()`` returns a percent-encoded ``file:`` URI while
    callers list raw local paths — decode the URI form (scheme stripped
    for ``file:``, kept for remote filesystems) so paths with spaces or
    non-ASCII characters match instead of being falsely reported
    quarantined (ADVICE r8). Paths WITHOUT a scheme are taken literally
    (a raw path legitimately containing ``%20`` is not decoded).
    """
    parsed = urlparse(path)
    if not parsed.scheme:
        return path
    p = unquote(parsed.path)
    if parsed.scheme == "file":
        return p
    return f"{parsed.scheme}://{parsed.netloc}{p}"


class LazyQuarantineReport:
    """File-grain quarantine report that fills from the caller's FIRST
    action on the returned DataFrame (``observe`` piggyback): for the
    common read→filter/transform→write shape the detection is free — the
    caller's own consumption is the scan. Accessing ``readable`` /
    ``quarantined`` before any action has run triggers ONE column-pruned
    detection pass (the observe keeps only ``input_file_name()`` alive —
    row-group metadata, no column data, for parquet/ORC), i.e. exactly
    the pre-r9 eager behavior.

    Contract hazard (documented, same as Spark's ``Observation``): only
    the FIRST action fills the metrics. If the caller's first action is
    PARTIAL — ``limit``/``take``/``show`` — the report reflects only the
    partitions that action touched. Consumers of the quarantine list must
    either read the report first (forcing the full detection pass) or
    make their first action a full one.

    Duck-typed to ``QuarantineReport`` (listed/readable/quarantined).
    """

    def __init__(self, obs, df: DataFrame, listed: list[str]) -> None:
        self._obs = obs
        self._df = df
        self.listed = listed
        self._readable: list[str] | None = None

    def _observation_filled(self) -> bool:
        try:  # non-public probe; any failure falls back to a detection pass
            return not self._obs._jo.getRowOrEmpty().isEmpty()
        except Exception:
            return False

    @property
    def readable(self) -> list[str]:
        if self._readable is None:
            if not self._observation_filled():
                # detection pass: column-pruned count over the observed
                # plan (fills the observation; reads no column data)
                self._df.count()
            self._readable = sorted(
                _normalize(p) for p in self._obs.get["files"]
            )
        return self._readable

    @property
    def quarantined(self) -> list[str]:
        return sorted(set(self.listed) - set(self.readable))


def _observed_quarantine_read(
    spark: SparkSession, paths: list[str], fmt: str
) -> tuple[DataFrame, "object", str]:
    """Shared scan builder: per-relation ignoreCorruptFiles + an
    Observation collecting the distinct source files DURING whatever
    action consumes the frame. Returns (observed_df, observation,
    src_col_name_used)."""
    from pyspark.sql.observation import Observation

    schema = _probe_schema(spark, paths, fmt)
    # Per-RELATION option (not the session conf): the returned DataFrame
    # must keep its drop-semantics across later actions without leaking a
    # session-wide corrupt-files policy. Multi-path reads go through
    # format().load(list) — PySpark's varargs DataFrameReader.orc(p1, p2)
    # is broken in this build (IllegalArgumentException without a schema;
    # SILENTLY reads only the first path with one), measured while adding
    # ORC support here.
    df = (
        spark.read.schema(schema)
        .option("ignoreCorruptFiles", "true")
        .format(fmt)
        .load(list(paths))
    )
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
    return observed, obs, src_col


def read_with_quarantine(
    spark: SparkSession, paths: list[str], fmt: str = "parquet"
) -> tuple[DataFrame, LazyQuarantineReport]:
    """Read parquet (or ORC) files, dropping unreadable ones with a report
    instead of failing the job (reference drop-and-report semantics).

    Pass structure (r9, VERDICT r8 task 5): ONE job total. The returned
    report is observe-backed — it fills from the caller's first (full)
    action on the returned DataFrame; reading the report before any
    action runs one column-pruned metadata-scale pass instead (the pre-r9
    behavior). See ``LazyQuarantineReport`` for the partial-first-action
    contract.

    Contract note (shared with ``ingest_untrusted``): a VALID file with
    zero rows yields no rows, so it is reported quarantined — at row
    grain, "contributed nothing" and "unreadable" are the same
    observation. Treat the quarantine list as drop-AND-REPORT; inspect
    before deleting.
    """
    observed, obs, _ = _observed_quarantine_read(spark, paths, fmt)
    listed = sorted(_normalize(p) for p in paths)
    return observed, LazyQuarantineReport(obs, observed, listed)


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


def _dest_row_count(spark: SparkSession, dest: str) -> int:
    """Footer/statistics-level row count of a parquet destination; 0 when
    the path does not exist yet (pre-write baseline for mode='append')."""
    try:
        return int(spark.read.parquet(dest).count())
    except Exception:
        return 0


def ingest_untrusted(
    spark: SparkSession,
    paths: list[str],
    dest: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "error",
    fmt: str = "parquet",
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
    (``observe``), so no separate detection pass runs. ``rows_written`` is
    the DELTA of the destination's footer-level row count across the write
    (pre-count 0 when dest is new or mode='overwrite'), so reconciliation
    is correct under mode='append' onto pre-existing data too (ADVICE r8).
    The collected file list is driver-side metadata-scale (~one string per
    input file — the same bound every file-listing step already carries).

    Contract note (shared with ``read_with_quarantine``): a VALID file
    with zero rows yields no rows, so it is reported quarantined — at
    row grain, "contributed nothing" and "unreadable" are the same
    observation. No rows are lost either way; treat the quarantine list
    as drop-AND-REPORT, inspect before deleting.
    """
    from nbi_oedi_etl_spark.sources.sinks import write_parquet

    observed, obs, _ = _observed_quarantine_read(spark, paths, fmt)
    pre_rows = 0 if mode == "overwrite" else _dest_row_count(spark, dest)
    write_parquet(observed, dest, partition_by=partition_by, mode=mode)
    rows_read = int(obs.get["rows"])
    readable = sorted(_normalize(p) for p in obs.get["files"])
    listed = sorted(_normalize(p) for p in paths)
    quarantined = sorted(set(listed) - set(readable))
    rows_written = _dest_row_count(spark, dest) - pre_rows
    return IngestReport(
        QuarantineReport(listed, readable, quarantined), rows_read, rows_written
    )
