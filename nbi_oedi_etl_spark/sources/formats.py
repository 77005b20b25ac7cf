"""Non-parquet formats: CSV / JSON / ORC read-write.

The reference's lake contains CSV alongside parquet but its ETL explicitly
excludes it (``Exclusions: ["*/csv/*"]``, reference etl/oedi_etl/main.py:138)
— SURVEY.md §2.1 notes the engine exposes Spark's remaining sources "for
free". These thin wrappers pin the options that matter for fidelity
(header/schema for CSV, line-delimited JSON) so round-trips preserve schema.

Scale notes: CSV/JSON are row-oriented and schema-inferred — inference scans
the data ONCE extra unless a schema is supplied, so at scale always pass
``schema=`` (all wrappers accept one). Timestamps round-trip through ISO
strings; parquet stays the performance format (columnar, predicate/column
pushdown) — these exist for interchange, not for the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType


def write_csv(df: DataFrame, path: str, mode: str = "error") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def read_csv(
    spark: SparkSession, path: str, schema=None, mode: str | None = None
) -> DataFrame:
    """``mode``: Spark's malformed-record policy — ``PERMISSIVE``
    (default: null-fill bad rows), ``DROPMALFORMED`` (silent drop — the
    anti-pattern the quarantine variant below replaces), or ``FAILFAST``
    (loud job failure, the right default for a warehouse)."""
    reader = spark.read.option("header", "true")
    if mode is not None:
        reader = reader.option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_json(df: DataFrame, path: str, mode: str = "error") -> None:
    df.write.mode(mode).json(path)


def read_json(
    spark: SparkSession, path: str, schema=None, mode: str | None = None
) -> DataFrame:
    reader = spark.read
    if mode is not None:
        reader = reader.option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


_CORRUPT_COL = "_corrupt_record"


def _split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    # Spark refuses a query that references ONLY the corrupt column of an
    # uncached PERMISSIVE scan (it would have to re-parse to know which
    # rows are corrupt) — the documented workaround is to cache first.
    # The cached frame itself is returned third so owners that fully
    # consume both sides in one call (ingest_untrusted_records) can
    # unpersist it — DataFrame.unpersist only acts on the exact frame
    # that was cached, not on derived children.
    df = df.cache()
    clean = df.where(F.col(_CORRUPT_COL).isNull()).drop(_CORRUPT_COL)
    quarantined = df.where(F.col(_CORRUPT_COL).isNotNull()).select(
        F.col(_CORRUPT_COL).alias("raw_record")
    )
    return clean, quarantined, df


def read_csv_with_quarantine(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Row-level drop-and-report for CSV — the row-grain analogue of
    ``sources.quarantine.read_with_quarantine`` (file grain, parquet) and
    the reference's log-and-drop (transform.py:168-170): malformed lines
    are split into a quarantine DataFrame carrying the RAW text
    (``raw_record``) instead of being silently null-filled (PERMISSIVE)
    or dropped (DROPMALFORMED). Returns (clean, quarantined).

    Scale: one PERMISSIVE scan, split by the corrupt column; the cache
    holds schema-width rows only for the scanned partitions — at 100 TB
    prefer FAILFAST ingest into parquet once, then this only on the
    untrusted edge (the cache stays alive for the returned frames —
    ``ingest_untrusted_records`` is the self-contained variant that frees
    it)."""
    clean, quarantined, _ = _read_text_split(spark, path, schema, "csv")
    return clean, quarantined


def read_json_with_quarantine(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Row-level drop-and-report for line-delimited JSON; see
    ``read_csv_with_quarantine``."""
    clean, quarantined, _ = _read_text_split(spark, path, schema, "json")
    return clean, quarantined


def _read_text_split(
    spark: SparkSession, path: str, schema: StructType, fmt: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """PERMISSIVE scan + corrupt-column split for csv/json; third element
    is the underlying cached frame (see ``_split_corrupt``)."""
    full = StructType(list(schema.fields)).add(_CORRUPT_COL, StringType())
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT_COL)
        .schema(full)
    )
    if fmt == "csv":
        df = reader.option("header", "true").csv(path)
    elif fmt == "json":
        df = reader.json(path)
    else:
        raise ValueError(f"unsupported text format: {fmt!r} (csv or json)")
    return _split_corrupt(df)


def ingest_untrusted_records(
    spark: SparkSession,
    path: str,
    schema: StructType,
    dest: str,
    fmt: str = "csv",
    partition_by: tuple[str, ...] = (),
    mode: str = "error",
) -> "RecordIngestReport":
    """Row-grain trust boundary for text formats — the CSV/JSON sibling of
    ``sources.quarantine.ingest_untrusted`` (file grain, parquet): malformed
    records are quarantined with their raw text, clean rows are re-encoded
    through the page-CRC-checksummed parquet sink, and the report reconciles
    clean rows in vs rows written.

    Pass structure: one PERMISSIVE scan (cached by the split, populated by
    the write job), the clean-row count ``observe``d during the write, and
    the quarantine rows compacted to a ``localCheckpoint`` read from that
    cache — then the full-width cache is UNPERSISTED, so only the (small)
    malformed-record frame occupies executor storage after the call
    (ADVICE r8: the cache previously leaked for the session lifetime).
    ``rows_written`` is the delta of the destination's footer-level count
    across the write, so reconciliation holds under mode='append' onto
    pre-existing data (ADVICE r8). At 100 TB text is an edge format; this
    is the one-call path that turns an untrusted CSV/JSON drop into
    verified warehouse parquet plus a quarantine frame to inspect.

    The returned ``quarantined_df`` is localCheckpoint-backed: it stays
    queryable after the source cache is gone (a corrupt-column-only query
    over an UNcached PERMISSIVE scan is refused by Spark), at the cost
    that its blocks do not survive executor loss — re-ingest to rebuild.
    """
    from pyspark.sql.observation import Observation

    from nbi_oedi_etl_spark.sources.quarantine import _dest_exists, _dest_row_count
    from nbi_oedi_etl_spark.sources.sinks import write_parquet

    skip_write = mode == "ignore" and _dest_exists(spark, dest)
    clean, quarantined, cached = _read_text_split(spark, path, schema, fmt)
    try:
        if skip_write:
            # SaveMode.Ignore with an existing destination runs NO job, so
            # an attached Observation would never fill and ``obs.get``
            # would block forever — inside this try, leaking the cache too
            # (ADVICE r9). Count the clean rows directly instead;
            # rows_written=0 makes ``reconciled`` False for non-empty
            # input, faithfully reporting that nothing was ingested.
            rows_clean = int(clean.count())
        else:
            # pre-count only when pre-existing rows can survive the write
            # (mode='error' fails on an existing dest; 'overwrite'
            # replaces; ignore-on-existing short-circuited above)
            pre_rows = _dest_row_count(spark, dest) if mode == "append" else 0
            obs = Observation("ingest_untrusted_records")
            # Check-then-act race (ADVICE r10): dest may be created by a
            # concurrent writer between _dest_exists and this write, and
            # SaveMode.Ignore's no-op fills the observation with ZEROS on
            # this Spark build — a silently wrong report. On a fresh dest
            # 'ignore' behaves exactly like 'error': write with 'error'
            # and translate a lost race into the skip behavior (count the
            # clean rows directly, rows_written=0).
            try:
                write_parquet(
                    clean.observe(obs, F.count(F.lit(1)).alias("rows")),
                    dest,
                    partition_by=partition_by,
                    mode="error" if mode == "ignore" else mode,
                )
                rows_clean = int(obs.get["rows"])
            except Exception as e:
                if mode == "ignore" and "ALREADY_EXISTS" in str(e).upper():
                    skip_write = True
                    rows_clean = int(clean.count())
                else:
                    raise
        # compact the malformed rows out of the full-width cache (populated
        # by the write/count job), then free the cache — only the small
        # quarantine frame survives in executor storage
        quarantined = quarantined.localCheckpoint(eager=True)
    finally:
        # the unpersist must run on EVERY exit path — a failed write
        # previously leaked the schema-width cache for the session
        # lifetime (r9 self-review)
        cached.unpersist()
    rows_quarantined = int(quarantined.count())
    rows_written = (
        0 if skip_write else _dest_row_count(spark, dest) - pre_rows
    )
    return RecordIngestReport(
        rows_clean, rows_quarantined, rows_written, quarantined
    )


class RecordIngestReport:
    """Outcome of one ``ingest_untrusted_records`` run. ``quarantined_df``
    carries the raw text of every malformed record (drop-AND-report)."""

    def __init__(
        self,
        rows_clean: int,
        rows_quarantined: int,
        rows_written: int,
        quarantined_df: DataFrame,
    ) -> None:
        self.rows_clean = rows_clean
        self.rows_quarantined = rows_quarantined
        self.rows_written = rows_written
        self.quarantined_df = quarantined_df

    @property
    def reconciled(self) -> bool:
        return self.rows_clean == self.rows_written


def write_orc(df: DataFrame, path: str, mode: str = "error") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Opaque-blob source (images/audio/video/other unparsed payloads):
    Spark's ``binaryFile`` format yields (path, modificationTime, length,
    content<binary>) — the ingestion edge of the multimodal pipeline
    (operators/multimodal.py consumes the ``content`` column).

    Scale notes: one row per FILE, so this is for object-per-sample
    layouts; batch many small samples into parquet with a binary column
    (the multimodal operators' native input) as early as possible — file
    listing, not bytes, dominates at 100 M objects. Use
    ``spark.sql.files.maxPartitionBytes`` to keep a task's blobs bounded in
    memory, and ``glob`` to prune at the listing (the reference's
    prefix-filter move, fetch.py:60-82, applied to blobs)."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
