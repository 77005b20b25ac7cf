"""The engine's user-pluggable UDF surface (SURVEY.md §2.10).

The reference has NO user extension point — its transform is a hardcoded
pyarrow program with 'additional transformations' left as TODO comments
(transform.py:4, README.md:81). This module is that missing slot, exposed
the idiomatic Spark way:

- scalar ``pandas_udf``: Arrow-vectorized column functions (10-100× faster
  than row-at-a-time Python UDFs — never use ``F.udf`` in a hot path)
- ``applyInPandas`` grouped-map: per-group pandas transforms (the exact
  shape of the reference's per-file worker, transform.py:125-170, but
  partition-parallel and Arrow-batched)

Built-ins still beat both — these exist for logic that genuinely needs
Python (model scoring, custom numerics).
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_WS_RE = re.compile(r"\s+")


@pandas_udf(StringType())
def normalize_text(s: pd.Series) -> pd.Series:
    """Arrow-vectorized text normalization: lowercase + collapse whitespace
    + trim. (Same semantics as the built-in
    ``trim(regexp_replace(lower(text), '\\s+', ' '))`` — kept as the
    canonical scalar-pandas_udf example.)"""
    return s.str.lower().str.replace(_WS_RE, " ", regex=True).str.strip()


DEMEAN_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("value_demeaned", DoubleType()),
    ]
)


def demean_values(events: DataFrame) -> DataFrame:
    """Grouped-map applyInPandas: per-user demeaned value.

    Each group arrives as one pandas DataFrame (groups must fit in executor
    memory — per-user event counts are bounded; for unbounded groups use a
    window function instead)."""

    def _demean(pdf: pd.DataFrame) -> pd.DataFrame:
        # Exact-cents mean: values carry 2 decimals, so summing integer
        # cents is exact (and order-independent) — the float mean is then
        # bit-identical to an external engine's decimal-sum/count, keeping
        # round(…, 6) deterministic across engines (see workload.py's
        # cross-engine determinism rules).
        cents = (pdf["value"] * 100).round()
        mean = (cents.sum() / 100.0) / len(pdf)
        # round half-AWAY-from-zero (matching SQL engines' round()); numpy's
        # .round is half-to-even and diverges at scaled ties.
        demeaned = pdf["value"] - mean
        import numpy as np

        rounded = np.copysign(np.floor(np.abs(demeaned) * 1e6 + 0.5), demeaned) / 1e6
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "value_demeaned": rounded,
            }
        )

    return (
        events.select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(_demean, DEMEAN_SCHEMA)
    )
