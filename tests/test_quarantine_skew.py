"""Tests for per-file error quarantine (§7.4.7) and skew-salting operators."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from nbi_oedi_etl_spark.operators.skew import salted_grouped_sum, salted_join_small_side
from nbi_oedi_etl_spark.sources.quarantine import read_with_quarantine
from nbi_oedi_etl_spark.sources import read_table

from .conftest import SF_SMALL


def test_quarantine_drops_corrupt_file_and_reports(spark, tmp_path):
    """Reference drop-and-report semantics (transform.py:168-170 +
    monitor discrepancy): corrupt file skipped, good data intact, report
    names the bad file."""
    good1 = tmp_path / "a.parquet"
    good2 = tmp_path / "b.parquet"
    bad = tmp_path / "c.parquet"
    pd.DataFrame({"x": [1, 2]}).to_parquet(good1, index=False)
    pd.DataFrame({"x": [3]}).to_parquet(good2, index=False)
    bad.write_bytes(b"PAR1 this is not really parquet")

    df, report = read_with_quarantine(spark, [str(good1), str(good2), str(bad)])
    assert sorted(r["x"] for r in df.collect()) == [1, 2, 3]
    assert report.quarantined == [str(bad)]
    assert len(report.readable) == 2
    # the scoped conf did not leak
    assert spark.conf.get("spark.sql.files.ignoreCorruptFiles") == "false"


def test_salted_grouped_sum_matches_plain_agg(spark):
    """Salting must be result-invariant: same sums/counts as the direct
    groupBy."""
    li = read_table(spark, SF_SMALL, "lineitem")
    salted = salted_grouped_sum(
        li, ["l_returnflag"], ["l_quantity"], salt_buckets=16
    )
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("l_quantity_sum"), F.count(F.lit(1)).alias("n_rows")
    )
    s = {r["l_returnflag"]: (r["l_quantity_sum"], r["n_rows"]) for r in salted.collect()}
    p = {r["l_returnflag"]: (r["l_quantity_sum"], r["n_rows"]) for r in plain.collect()}
    assert s.keys() == p.keys()
    for k in p:
        assert s[k][1] == p[k][1]
        assert abs(s[k][0] - p[k][0]) < 1e-6 * max(1.0, abs(p[k][0]))


def test_salted_join_matches_plain_join(spark):
    orders = read_table(spark, SF_SMALL, "orders")
    customer = read_table(spark, SF_SMALL, "customer")
    salted_n = salted_join_small_side(
        orders, customer, "o_custkey", "c_custkey", salt_buckets=4
    ).count()
    plain_n = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).count()
    assert salted_n == plain_n
