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


def read_with_quarantine(
    spark: SparkSession, paths: list[str]
) -> tuple[DataFrame, QuarantineReport]:
    """Read parquet files, dropping unreadable ones with a report instead of
    failing the job (reference drop-and-report semantics)."""
    # Schema inference reads EVERY footer and fails before
    # ignoreCorruptFiles can apply at task level — probe for the first
    # readable footer and scan with an explicit schema instead.
    schema = None
    for p in paths:
        try:
            schema = spark.read.parquet(p).schema
            break
        except Exception:
            continue
    if schema is None:
        raise ValueError("no readable parquet file among inputs")
    # Per-RELATION option (not the session conf): the returned DataFrame
    # must keep its drop-semantics across later actions without leaking a
    # session-wide corrupt-files policy.
    df = (
        spark.read.schema(schema)
        .option("ignoreCorruptFiles", "true")
        .parquet(*paths)
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
) -> IngestReport:
    """Trust boundary for external parquet: quarantine unreadable files,
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

    Pass structure at 100 TB: one metadata-scale probe + one full scan for
    file quarantine (``read_with_quarantine``), one scan fused with the
    re-encode write (``observe`` counts rows during the write job — no
    extra pass), and one footer-level count of the output. The output
    count is the only post-write read and touches statistics, not data.
    """
    from pyspark.sql.observation import Observation

    from nbi_oedi_etl_spark.sources.sinks import write_parquet

    df, files = read_with_quarantine(spark, paths)
    obs = Observation("ingest_untrusted")
    write_parquet(
        df.observe(obs, F.count(F.lit(1)).alias("rows")),
        dest,
        partition_by=partition_by,
        mode=mode,
    )
    rows_read = int(obs.get["rows"])
    rows_written = int(spark.read.parquet(dest).count())
    return IngestReport(files, rows_read, rows_written)
