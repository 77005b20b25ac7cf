"""The driver gate, run locally: every oracle-backed query in the workload
registry must match its DuckDB twin at ORACLE_SF_DIR (default sf0.01);
rows-only queries must run and return a stable schema.
"""

from __future__ import annotations

import pytest

from nbi_oedi_etl_spark import workload

from .conftest import SF_ORACLE, assert_oracle_match, assert_scalar_schema

_ORACLE_SPECS = [s for s in workload.SPECS if s.oracle is not None]
_ROWS_ONLY_SPECS = [s for s in workload.SPECS if s.oracle is None]


@pytest.mark.parametrize("spec", _ORACLE_SPECS, ids=[s.name for s in _ORACLE_SPECS])
def test_oracle_parity(spark, oracle_con, spec):
    df = spec.fn(spark, SF_ORACLE)
    assert_oracle_match(df, oracle_con, spec.oracle)


@pytest.mark.parametrize("spec", _ROWS_ONLY_SPECS, ids=[s.name for s in _ROWS_ONLY_SPECS])
def test_rows_only_queries_run(spark, spec):
    df = spec.fn(spark, SF_ORACLE)
    assert len(df.schema.fields) > 0
    assert_scalar_schema(df, spec.name)
    assert df.count() >= 0


def test_approx_count_distinct_within_hll_bound(spark):
    """Value-pins the rows-only ref_q1_approx_count_distinct: Spark's
    approx_count_distinct is HyperLogLog++ with default rsd = 0.05, so the
    estimate must land within 4·rsd of the exact count (4 standard errors;
    and the estimate is DETERMINISTIC for fixed input — same hash, no
    seed — so this is a stable gate, not a flaky probabilistic one)."""
    qs = workload.queries()
    exact = qs["ref_q1_count_distinct"](spark, SF_ORACLE).collect()[0][0]
    approx = qs["ref_q1_approx_count_distinct"](spark, SF_ORACLE).collect()[0][0]
    assert exact > 0
    assert abs(approx - exact) <= max(1, 4 * 0.05 * exact), (approx, exact)


def test_entry_smoke(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location("entry_mod", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())
