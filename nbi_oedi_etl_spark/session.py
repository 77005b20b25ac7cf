"""SparkSession factory with the engine's canonical configuration.

Scale posture (SURVEY.md §4): the reference runs on 1 DPU (4 vCPU / 16 GB) and
bakes its optimizations into pipeline design. Here every optimization is a
session config + declarative plan: AQE (runtime coalesce / skew-join split),
parquet filter pushdown + column pruning, broadcast joins for dimension
tables, UTC timezone pinned for timestamp-floor fidelity
(reference transform.py:23-43 floors epoch-ms in UTC; Spark date_trunc is
session-timezone dependent — SURVEY.md §7.4.4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for a 1000-executor / 100 TB posture but safe on local[*]:
# - AQE on: runtime partition coalescing, skew-join splitting, plan re-opt.
# - shuffle.partitions: overridable; at cluster scale set ~2-3x total cores,
#   AQE coalesces down so over-provisioning is cheap.
# - maxPartitionBytes 128m: standard split size so a 100 TB scan yields
#   ~800k tasks, amortized by task scheduling; raise for fewer, fatter tasks.
# - autoBroadcastJoinThreshold 64m: dimension tables (metadata/customer/
#   nation/region) broadcast instead of shuffling the fact side.
_DEFAULT_CONF = {
    "spark.sql.session.timeZone": "UTC",
    # local mode = single JVM: driver memory is the only heap knob.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
    "spark.ui.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.parquet.compression.codec": "snappy",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    # Timestamps in the testdata parquet carry no timezone annotation; keep
    # them NTZ so Spark and the DuckDB oracle see identical naive values.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    # TIMESTAMP(NANOS) parquet (events.ts) is otherwise unreadable; the
    # source layer rebuilds a proper NTZ timestamp from the raw long.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # RFC-4648 base64 without MIME line-chunking (matches DuckDB/Trino;
    # chunked output breaks cross-engine comparison of encoded columns).
    "spark.sql.chunkBase64String.enabled": "false",
    # Scan-node metadata (PushedFilters/PartitionFilters) is truncated to
    # this many chars AT PLAN BUILD TIME; the default 100 hides all but the
    # first pushed predicates, making plan assertions (tests/test_plans.py)
    # and operator plan audits blind. Costs nothing at execution.
    "spark.sql.maxMetadataStringLength": "10000",
    # Parquet page-level CRC32s, written AND verified (fault_sweep r8): a
    # mid-page bit flip that survives snappy decompression silently
    # alters values otherwise — measured 25/25 such flips caught with
    # verify on, 0/25 without. Write cost is one CRC per page; verify
    # cost is in the decompression noise. External files written without
    # checksums (e.g. pyarrow defaults) remain undetectable — engine-
    # written data is the protected surface.
    "spark.hadoop.parquet.page.write-checksum.enabled": "true",
    "spark.hadoop.parquet.page.verify-checksum.enabled": "true",
}


def get_spark(
    app_name: str = "nbi-oedi-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the canonical SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract) or
    ``local[*]``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULT_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
