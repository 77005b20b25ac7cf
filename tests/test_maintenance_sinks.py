"""Maintenance sinks: small-file compaction and write-audit-publish.

Reference parity: the reference uploads then reconciles after the fact
(etl/oedi_etl/monitor.py discrepancy check); write_audited gates BEFORE
publication. Compaction is the post-streaming-ingest hygiene job
(availableNow drains emit one file per micro-batch per partition).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources import read_table
from nbi_oedi_etl_spark.sources.sinks import compact_parquet, write_audited


def _parquet_files(path: str) -> list[str]:
    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]


def test_compact_many_small_files_to_target_size(spark, tmp_path):
    src, dest = str(tmp_path / "frag"), str(tmp_path / "compact")
    orders = read_table(spark, "/root/testdata/sf0.01", "orders")
    orders.repartition(64).write.parquet(src)  # simulate micro-batch debris
    assert len(_parquet_files(src)) >= 64

    total = sum(os.path.getsize(f) for f in _parquet_files(src))
    target = max(1, total // 4)  # force ~4 output files
    n_out = compact_parquet(spark, src, dest, target_file_bytes=target)
    files_out = _parquet_files(dest)
    assert n_out == len(files_out)
    assert len(files_out) <= 8, "compaction must collapse the 64 fragments"
    # lossless: same rows
    a = spark.read.parquet(src).count()
    b = spark.read.parquet(dest).count()
    assert a == b


def test_write_audited_publishes_only_clean_data(spark, tmp_path):
    path = str(tmp_path / "published")
    good = read_table(spark, "/root/testdata/sf0.001", "orders")
    counts = write_audited(
        good,
        path,
        constraints=[
            ("custkey_not_null", "o_custkey IS NOT NULL"),
            ("price_positive", "o_totalprice > 0"),
        ],
    )
    assert set(counts.values()) == {0}
    assert os.path.isdir(path)
    assert not os.path.exists(path + "._staging"), "staging cleaned on publish"
    assert spark.read.parquet(path).count() == good.count()


def test_write_audited_blocks_bad_batch(spark, tmp_path):
    path = str(tmp_path / "published")
    bad = read_table(spark, "/root/testdata/sf0.001", "orders").withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(-1.0)).otherwise(
            F.col("o_totalprice")
        ),
    )
    with pytest.raises(ValueError, match="price_positive"):
        write_audited(bad, path, constraints=[("price_positive", "o_totalprice > 0")])
    assert not os.path.exists(path), "bad batch must never reach the serving path"
    assert os.path.isdir(path + "._staging"), "staged data kept for inspection"
