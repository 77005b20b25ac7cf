"""Accuracy pin for the bottom-k quantile sketch: the hash-deterministic
sample's deciles must track the EXACT population deciles (computed by
DuckDB's total-order sort — the verification tier the query itself
deliberately omits; at scale you run the sketch, not the sort).

The pin is in RANK space, where the sampling theory lives: the
population CDF evaluated at the sketch's q-th decile must sit within
3.5·sqrt(q(1-q)/k) of q (k=500). A value-space bound would conflate
sampling noise with local price density; the rank-space bound catches
broken sampling/rank arithmetic at ~3.5σ while accepting legitimate
sample error.
"""

from __future__ import annotations

import math

from nbi_oedi_etl_spark import workload

from .conftest import SF_ORACLE

_K = 500


def test_sketch_deciles_track_exact(spark, oracle_con):
    got = {
        r["q"]: r["decile_value"]
        for r in workload.queries()["quantile_sketch_order_price"](
            spark, SF_ORACLE
        ).collect()
    }
    assert len(got) == 9
    n = oracle_con.sql("SELECT count(*) FROM orders").fetchone()[0]
    for q in range(1, 10):
        cdf = (
            oracle_con.sql(
                f"SELECT count(*) FROM orders WHERE o_totalprice <= {got[q]!r}"
            ).fetchone()[0]
            / n
        )
        p = q / 10.0
        bound = 3.5 * math.sqrt(p * (1 - p) / _K)
        assert abs(cdf - p) <= bound, (
            f"decile {q}: sketch value sits at population CDF {cdf:.4f}, "
            f"expected {p} ± {bound:.4f}"
        )
