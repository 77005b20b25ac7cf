"""Catalog registration — the engine's replacement for Glue crawlers.

The reference creates no tables in code; Glue crawlers infer them after each
run (lib/nbi-open-data-analytics-stack.ts:351-389, main.py:115-148), with the
naming convention ``<prefix>_state_<xx>`` for per-state data tables and a
single shared ``<prefix>_parquet`` metadata table (sql/saved-queries.sql:13-14,
README.md:370-372). In Spark the equivalent is explicit and deterministic:
``CREATE TABLE … USING PARQUET LOCATION …`` + ``recoverPartitions``.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import SparkSession


def register_parquet_table(
    spark: SparkSession, name: str, location: str, recover_partitions: bool = True
) -> None:
    """Register an external parquet table over ``location`` (schema inferred)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(f"CREATE TABLE {name} USING PARQUET LOCATION '{location}'")
    if recover_partitions:
        try:
            spark.catalog.recoverPartitions(name)
        except AnalysisException:
            # Unpartitioned layout — nothing to recover. Anything else
            # (permissions, bad location, catalog failure) propagates.
            pass


def data_table_name(prefix: str, state: str) -> str:
    """Per-state data table name, reference convention ``<prefix>_state_<xx>``
    (sql/saved-queries.sql:14)."""
    return f"{prefix}_state_{state.lower()}"


def metadata_table_name(prefix: str) -> str:
    """Shared metadata table name, reference convention ``<prefix>_parquet``
    (sql/saved-queries.sql:13)."""
    return f"{prefix}_parquet"
