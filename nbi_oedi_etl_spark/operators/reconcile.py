"""Reconciliation — the reference monitor's discrepancy detection as engine
operators (SURVEY.md §2.7 E1, M4).

The reference hashes the listed and uploaded key sets (blake2b 8-byte,
monitor.py:154-164) and reports ``listed − uploaded`` with a reverse lookup
(monitor.py:87-106; sample report README.md:352-361). Distributed restatement:
a LEFT ANTI join — no driver-side sets, scales to any key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.functions.scalars import dotted


def discrepancies(
    expected: DataFrame,
    actual: DataFrame,
    expected_key: str,
    actual_key: str | None = None,
) -> DataFrame:
    """Keys present in ``expected`` but missing from ``actual``
    ("Listed but not Uploaded", monitor.py:99-106).

    LEFT ANTI join; when ``actual``'s key set is small Spark broadcasts it
    automatically (broadcast anti-join), otherwise it's a shuffled hash
    anti-join — either way no collect().
    """
    a_key = actual_key or expected_key
    cond = expected[expected_key] == actual[a_key]
    return expected.join(actual, cond, "left_anti")


def reconciliation_report(
    expected: DataFrame, actual: DataFrame, expected_key: str, actual_key: str | None = None
) -> dict[str, int]:
    """Summary counts mirroring the reference's job summary fields
    (monitor.py:108-136): expected/actual totals + discrepancy count."""
    missing = discrepancies(expected, actual, expected_key, actual_key)
    return {
        "listed": expected.count(),
        "uploaded": actual.count(),
        "discrepancies": missing.count(),
    }
