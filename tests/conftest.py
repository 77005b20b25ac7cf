"""Shared fixtures: one SparkSession per test run + the DuckDB oracle
harness replicating the driver's compare (row count + schema + order-
insensitive value comparison after sorting columns by name).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from nbi_oedi_etl_spark import get_spark
from nbi_oedi_etl_spark.sources import TABLES

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="nbi-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1).copy()
    for c in out.columns:
        if str(out[c].dtype).startswith("datetime64"):
            # unify timestamp resolution (duckdb → us, spark → ns)
            out[c] = out[c].astype("datetime64[us]")
        elif out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(by=list(out.columns), ignore_index=True)


def assert_scalar_schema(spark_df, name: str = "") -> None:
    """Driver-canonicalizer contract: every declared output column must be
    scalar-typed. The driver sorts rows with pandas ``sort_values``, which
    raises ``unhashable type: 'list'`` on array/map/struct columns (the sole
    red row in CORRECTNESS_r03 was exactly this: order_rollup_per_customer
    exposed a raw ``array<long>`` column)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name or 'query'} declares non-scalar output columns {complex_cols}; "
        "the driver's pandas canonicalizer cannot sort these"
    )


def assert_oracle_match(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Driver-gate replica: exact value match after column-name sort +
    row sort. Floats must be bit-comparable (queries are written so)."""
    assert_scalar_schema(spark_df)
    got = _normalize(spark_df.toPandas())
    want = _normalize(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            both_nan = g.isna() & w.isna()
            eq = (g == w) | both_nan
            # bit-exactness expected; report the worst offender if not
            if not eq.all():
                bad = (~eq).idxmax()
                diff = abs((g - w).dropna()).max()
                raise AssertionError(
                    f"float column {c!r} mismatch at row {bad}: "
                    f"spark={g[bad]!r} oracle={w[bad]!r} (max abs diff {diff})"
                )
        else:
            eq = (g == w) | (g.isna() & w.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                raise AssertionError(
                    f"column {c!r} mismatch at row {bad}: "
                    f"spark={g[bad]!r} oracle={w[bad]!r}"
                )
