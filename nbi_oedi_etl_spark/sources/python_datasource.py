"""Custom source via Spark 4's Python DataSource API — the user-pluggable
ingestion slot the reference fills with hand-rolled asyncio fetch workers
(fetch.py:40-249). A DataSource subclass declares schema + partitions;
each partition reads independently on an executor — the same
"list prefixes, fetch per key" decomposition, but scheduled by Spark
instead of a hand-built queue pipeline, and composable with every
downstream operator because the output is just a DataFrame.

The concrete source here generates a deterministic synthetic
building-telemetry feed (one partition per building, one day of 15-min
readings — the reference's OEDI row shape): values are pure integer
arithmetic on (building, quarter-hour index), so an external engine can
regenerate the identical rows and the source slots into the oracle-
checked query surface like any parquet table.

Scale: partitions() is the parallelism contract — one InputPartition per
building maps a 100k-building fleet to 100k independent executor tasks
(the real-world version would batch buildings per partition the way the
reference pages its S3 listing, fetch.py:86-93).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

READINGS_PER_DAY = 96  # 15-min cadence
BASE_DAY = dt.datetime(2024, 1, 1)


def reading_value(bldg_id: int, slot: int) -> float:
    """Deterministic, engine-portable reading: integer mod scaled by 10."""
    return ((bldg_id * READINGS_PER_DAY + slot) % 1000) / 10.0


class SyntheticBuildingsDataSource(DataSource):
    """``spark.read.format("synthetic_buildings").option("buildings", N)``"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_buildings"

    def schema(self) -> str:
        return "bldg_id int, ts timestamp_ntz, value double"

    def reader(self, schema) -> DataSourceReader:
        return _Reader(int(self.options.get("buildings", 8)))


class _Reader(DataSourceReader):
    def __init__(self, n_buildings: int):
        self.n_buildings = n_buildings

    def partitions(self):
        return [InputPartition(b) for b in range(self.n_buildings)]

    def read(self, partition: InputPartition):
        b = partition.value
        for slot in range(READINGS_PER_DAY):
            yield (
                b,
                BASE_DAY + dt.timedelta(minutes=15 * slot),
                reading_value(b, slot),
            )


def register(spark) -> None:
    spark.dataSource.register(SyntheticBuildingsDataSource)
