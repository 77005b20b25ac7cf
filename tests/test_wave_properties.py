"""Property tests for the wave 6-11 operators: independently-computed
expectations on crafted/randomized inputs (the §5 posture — the oracle
gate proves cross-engine equality; these prove the SEMANTICS).
"""

from __future__ import annotations

import math
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from nbi_oedi_etl_spark import workload
from nbi_oedi_etl_spark import workload_ext12 as ext12
from nbi_oedi_etl_spark import workload_ext14 as ext14

SF = "/root/testdata/sf0.01"


def _docs_dir(texts: list[str]) -> str:
    d = tempfile.mkdtemp(prefix="wave_props_")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["src0"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    return d


def test_winnowing_guarantee_shared_long_substring(spark):
    """The winnowing theorem (Schleimer et al.): any match of length
    ≥ k + w − 1 (= 8 normalized chars here) between two documents shares
    at least one fingerprint. Plant a 30-char common substring inside
    otherwise-disjoint documents and assert fingerprint overlap."""
    common = "thequickbrownfoxjumpsoverzdogs"
    a = "aaaa" + common + "bbbbcccc"
    b = "zzzzxxxx" + common + "qqqq"
    # control: no shared ≥8-char substring
    c = "mmmmnnnnooooppppqqrrssttuuvvww"
    d = _docs_dir([a, b, c])
    fps = (
        ext12.winnowing_fingerprints(spark, d)
        .collect()
    )
    # recompute the raw fingerprint SETS (the query aggregates) directly
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{d}/documents.parquet")
    clean = docs.select(
        "doc_id", F.regexp_replace(F.lower("text"), "[^a-z0-9]", "").alias("c")
    )
    chars = clean.select(
        "doc_id",
        (F.length("c") - 4).alias("n_grams"),
        F.posexplode(F.split("c", "(?!^)")).alias("pos", "ch"),
    ).where(F.col("ch") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = chars.select(
        "doc_id",
        "n_grams",
        "pos",
        F.concat(
            "ch",
            F.lead("ch", 1).over(w),
            F.lead("ch", 2).over(w),
            F.lead("ch", 3).over(w),
            F.lead("ch", 4).over(w),
        ).alias("gram"),
    ).where(F.col("gram").isNotNull())
    roll = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    sets = (
        grams.select(
            "doc_id",
            "pos",
            "n_grams",
            F.min(
                F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("bigint")
            ).over(roll).alias("fp"),
        )
        .where(F.col("pos") <= F.col("n_grams") - 4)
        .groupBy("doc_id")
        .agg(F.collect_set("fp").alias("fps"))
        .collect()
    )
    by_id = {r["doc_id"]: set(r["fps"]) for r in sets}
    assert by_id[0] & by_id[1], "planted 30-char match must share a fingerprint"
    assert not (by_id[0] & by_id[2]) and not (by_id[1] & by_id[2]), (
        "disjoint docs must not share fingerprints"
    )
    # density sanity: fingerprints ≤ k-gram count, ≥ count/window
    for r in fps:
        assert r["n_fingerprints"] >= 1


def test_keyset_pagination_is_gap_and_dup_free(spark):
    """Concatenating the seek-fetched page with the first three OFFSET
    pages must reproduce the global top-80 exactly: no boundary gaps, no
    duplicates — the keyset invariant."""
    qs = workload.queries()
    page4 = qs["orders_keyset_pagination"](spark, SF).collect()
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .orderBy(F.desc("price"), F.asc("o_orderkey"))
        .limit(80)
        .collect()
    )
    expected_page4 = [(r["o_orderkey"], float(r["price"])) for r in o[60:80]]
    got = [(r["o_orderkey"], r["totalprice"]) for r in page4]
    assert got == expected_page4


def test_percentiles_cont_match_numpy_linear(spark):
    """The exact rational interpolation must agree with numpy's 'linear'
    percentile method to float tolerance on every group."""
    import numpy as np

    qs = workload.queries()
    rows = qs["order_price_percentiles_cont"](spark, SF).collect()
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderpriority", F.col("o_totalprice").cast("double").alias("v")
    ).collect()
    by_g: dict[str, list[float]] = {}
    for r in o:
        by_g.setdefault(r["o_orderpriority"], []).append(round(r["v"], 2))
    for r in rows:
        want = float(
            np.percentile(np.array(sorted(by_g[r["o_orderpriority"]])), r["p"],
                          method="linear")
        )
        assert abs(r["percentile"] - want) < 1e-6, (r, want)


def test_psi_identical_epochs_is_zero(spark):
    """PSI of a distribution against itself must be exactly 0 — build a
    synthetic events dir whose two epochs contain identical value
    multisets."""
    import datetime as dt

    d = tempfile.mkdtemp(prefix="psi_props_")
    values = [float(v % 100) for v in range(500)]
    ts_a = [dt.datetime(2024, 1, 5, 0, 0, i % 60) for i in range(500)]
    ts_b = [dt.datetime(2024, 1, 25, 0, 0, i % 60) for i in range(500)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(1000), type=pa.int64()),
            "ts": pa.array(ts_a + ts_b, type=pa.timestamp("us")),
            "user_id": pa.array([1] * 1000, type=pa.int64()),
            "event_type": pa.array(["view"] * 1000),
            "value": pa.array(values + values, type=pa.float64()),
            "props": pa.array(["{}"] * 1000),
        }
    )
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    from nbi_oedi_etl_spark import workload_ext15 as ext15

    row = ext15.event_value_psi_drift(spark, d).collect()[0]
    assert row["n_epoch_a"] == 500 and row["n_epoch_b"] == 500
    assert row["psi"] == 0.0


def test_burstiness_periodic_sequence_approaches_minus_one(spark):
    """A perfectly periodic event train has σ = 0 → burstiness = −1; a
    heavy-tailed one has B > 0. Calibrates the Goh-Barabási statistic."""
    import datetime as dt

    d = tempfile.mkdtemp(prefix="burst_props_")
    periodic = [dt.datetime(2024, 1, 1) + dt.timedelta(seconds=60 * i) for i in range(50)]
    bursty_offsets = [0, 1, 2, 3, 4, 3600, 3601, 3602, 7200, 36000]
    bursty = [dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s) for s in bursty_offsets]
    ts = periodic + bursty
    uid = [1] * len(periodic) + [2] * len(bursty)
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(ts)), type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(uid, type=pa.int64()),
            "event_type": pa.array(["view"] * len(ts)),
            "value": pa.array([1.0] * len(ts), type=pa.float64()),
            "props": pa.array(["{}"] * len(ts)),
        }
    )
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    rows = {r["user_id"]: r for r in ext14.user_interarrival_stats(spark, d).collect()}
    assert rows[1]["burstiness"] == -1.0 and rows[1]["std_gap_s"] == 0.0
    assert rows[2]["burstiness"] > 0.3


def test_content_digest_is_partition_invariant(spark):
    """The XOR digest must be identical under any repartitioning — the
    order-free property the audit rests on."""
    qs = workload.queries()
    base = {
        r["orderstatus"]: r["content_digest"]
        for r in qs["table_content_digest"](spark, SF).collect()
    }
    # recompute over a deliberately re-partitioned copy
    d = tempfile.mkdtemp(prefix="digest_props_")
    spark.read.parquet(f"{SF}/orders.parquet").repartition(17).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "orders.parquet"))
    again = {
        r["orderstatus"]: r["content_digest"]
        for r in qs["table_content_digest"](spark, d).collect()
    }
    assert base == again
