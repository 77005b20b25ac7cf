"""Per-file failure isolation (SURVEY.md §7.4.7).

The reference logs-and-drops files that fail transformation
(transform.py:168-170) and surfaces them in the discrepancy report
(monitor.py:87-106, e.g. the 5790-1.parquet case README.md:352-361). Spark
fails the whole job on a corrupt file by default — the right default for a
warehouse — so drop-and-report is OPT-IN here:

1. read with ``spark.sql.files.ignoreCorruptFiles=true`` (scoped, restored
   after),
2. diff listed files vs files that actually produced rows (anti-join —
   the reference's listed-vs-uploaded reconciliation applied to inputs),
3. return (DataFrame, quarantine report).
"""

from __future__ import annotations

from dataclasses import dataclass

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


def read_with_quarantine(
    spark: SparkSession, paths: list[str], fmt: str = "parquet"
) -> tuple[DataFrame, QuarantineReport]:
    """Read parquet (or ORC) files, dropping unreadable ones with a report
    instead of failing the job (reference drop-and-report semantics)."""
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
    # files that actually yielded rows (driver-side: file list is
    # metadata-scale, not data-scale)
    readable = sorted(
        r["f"] for r in df.select(F.input_file_name().alias("f")).distinct().collect()
    )
    listed = sorted(_normalize(p) for p in paths)
    readable_norm = sorted(_normalize(p) for p in readable)
    quarantined = sorted(set(listed) - set(readable_norm))
    return df, QuarantineReport(listed, readable_norm, quarantined)


def _normalize(path: str) -> str:
    return path.removeprefix("file://").removeprefix("file:")


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
    the input row count are both computed DURING the re-encode write job —
    ``observe`` collects ``count(*)`` and ``collect_set`` of the
    materialized ``input_file_name()`` (materialized as a column first:
    InputFileName cannot be evaluated inside observe's accumulator), so no
    separate detection pass runs. The post-write count of the output is
    footer/statistics work, not a data scan. The collected file list is
    driver-side metadata-scale (~one string per input file — the same
    bound every file-listing step already carries).

    Contract note (shared with ``read_with_quarantine``): a VALID file
    with zero rows yields no rows, so it is reported quarantined — at
    row grain, "contributed nothing" and "unreadable" are the same
    observation. No rows are lost either way; treat the quarantine list
    as drop-AND-REPORT, inspect before deleting.
    """
    from pyspark.sql.observation import Observation

    from nbi_oedi_etl_spark.sources.sinks import write_parquet

    schema = _probe_schema(spark, paths, fmt)
    # Per-RELATION option, as in read_with_quarantine: drop-semantics stay
    # with this DataFrame without leaking a session-wide policy; see the
    # format().load(list) note there (varargs .orc() is unsafe multi-path).
    df = (
        spark.read.schema(schema)
        .option("ignoreCorruptFiles", "true")
        .format(fmt)
        .load(list(paths))
    )
    src_col = "_src_file"
    while src_col in df.columns:  # never shadow a real input column
        src_col += "_"
    obs = Observation("ingest_untrusted")
    observed = (
        df.withColumn(src_col, F.input_file_name())
        .observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            F.collect_set(src_col).alias("files"),
        )
        .drop(src_col)
    )
    write_parquet(observed, dest, partition_by=partition_by, mode=mode)
    rows_read = int(obs.get["rows"])
    readable = sorted(_normalize(p) for p in obs.get["files"])
    listed = sorted(_normalize(p) for p in paths)
    quarantined = sorted(set(listed) - set(readable))
    rows_written = int(spark.read.parquet(dest).count())
    return IngestReport(
        QuarantineReport(listed, readable, quarantined), rows_read, rows_written
    )
