"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: float = 0.5) -> DataFrame:
    """Repartition iff the input has fewer partitions than the cluster can
    use in parallel.

    CPU-bound per-row stages (signature computation, similarity scoring) are
    bottlenecked by input split count, not data size: a single small parquet
    file yields ONE task no matter how many cores exist. At real scale the
    file splits already provide parallelism and this is a no-op (guarded by
    the partition-count check); on small inputs the extra shuffle is
    negligible next to the CPU work it unlocks.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(target * min_factor)):
        return df.repartition(target)
    return df
