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


def write_csv(df: DataFrame, path: str, mode: str = "error") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_json(df: DataFrame, path: str, mode: str = "error") -> None:
    df.write.mode(mode).json(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


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
