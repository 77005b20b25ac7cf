"""Property-based tests (hypothesis) — the test-strategy upgrade over the
reference's single smoke assertion (SURVEY.md §5: property/randomized tests
'all absent'). Random inputs, independently-computed expectations.
"""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nbi_oedi_etl_spark.operators.resample import resample_hourly
from nbi_oedi_etl_spark.operators.skew import salted_grouped_sum

_EPOCH = dt.datetime(2024, 1, 1)

_event_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),          # event_id
        st.integers(min_value=0, max_value=6 * 3600),        # seconds offset
        st.integers(min_value=1, max_value=3),               # user_id
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_event_rows)
def test_resample_hourly_matches_pandas(spark, rows):
    """For ANY event set: per (user, hour) the engine's min/mean equal an
    independent pandas groupby computation."""
    pdf = pd.DataFrame(
        [
            {
                "event_id": eid,
                "ts": _EPOCH + dt.timedelta(seconds=off),
                "user_id": uid,
                "value": float(val),
            }
            for eid, off, uid, val in rows
        ]
    )
    df = spark.createDataFrame(pdf)
    got = {
        (r["user_id"], r["ts_hour"]): (r["event_id_min"], r["value_mean"])
        for r in resample_hourly(
            df,
            ts_col="ts",
            entity_cols=("user_id",),
            min_cols=("event_id",),
            mean_cols=("value",),
            hour_col="ts_hour",
        ).collect()
    }
    exp = pdf.assign(hour=pdf["ts"].dt.floor("h")).groupby(["user_id", "hour"])
    want = {
        (uid, hour): (g["event_id"].min(), g["value"].mean())
        for (uid, hour), g in exp
    }
    assert set(got) == set(want)
    for k, (emin, vmean) in want.items():
        assert got[k][0] == emin
        assert math.isclose(got[k][1], vmean, rel_tol=1e-9, abs_tol=1e-9)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 1000)),  # (key, ts offset s)
        min_size=1,
        max_size=40,
    ),
    right=st.lists(
        st.tuples(
            st.integers(1, 3), st.integers(0, 1000), st.integers(-100, 100)
        ),  # (key, ts offset s, payload)
        min_size=0,
        max_size=40,
        unique_by=lambda t: (t[0], t[1]),
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """For ANY left/right event sets (left-ts == right-ts exact matches
    included): the union+window as-of join equals pandas merge_asof
    (backward, exact matches allowed). Right rows are unique per (key, ts):
    with same-key same-ts right DUPLICATES the winner is engine-defined in
    every engine (pandas: input order; DuckDB ASOF: unspecified; here: sort
    stability) — excluded by construction rather than pinned."""
    from nbi_oedi_etl_spark.operators.asof import asof_join

    lp = pd.DataFrame(
        [
            {"k": k, "ts": _EPOCH + dt.timedelta(seconds=s), "lid": i}
            for i, (k, s) in enumerate(left)
        ]
    )
    rp = pd.DataFrame(
        [
            {"k": k, "ts": _EPOCH + dt.timedelta(seconds=s), "pay": float(p)}
            for k, s, p in right
        ],
        columns=["k", "ts", "pay"],
    )
    ldf = spark.createDataFrame(lp)
    if len(rp):
        rdf = spark.createDataFrame(rp)
    else:
        rdf = spark.createDataFrame([], "k bigint, ts timestamp, pay double")
    got = {
        r["lid"]: r["pay_asof"]
        for r in asof_join(
            ldf, rdf, on="k", left_ts="ts", right_ts="ts", right_payload=["pay"]
        ).collect()
    }
    if len(rp):
        want_df = pd.merge_asof(
            lp.sort_values(["ts", "lid"]),
            rp.sort_values(["ts", "k"]),
            on="ts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        want = dict(zip(want_df["lid"], want_df["pay"]))
    else:
        want = {lid: float("nan") for lid in lp["lid"]}
    assert set(got) == set(want)
    for lid in want:
        g, w = got[lid], want[lid]
        assert (g is None and pd.isna(w)) or g == w, (lid, g, w)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "hot"]), st.integers(-1000, 1000)),
        min_size=1,
        max_size=80,
    ),
    buckets=st.sampled_from([1, 2, 16]),
)
def test_salted_sum_is_salt_invariant(spark, rows, buckets):
    """Salting must never change sums/counts, for any bucket count."""
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    df = spark.createDataFrame(pdf)
    got = {
        r["k"]: (r["v_sum"], r["n_rows"])
        for r in salted_grouped_sum(df, ["k"], ["v"], salt_buckets=buckets).collect()
    }
    want = {
        k: (int(g["v"].sum()), len(g)) for k, g in pdf.groupby("k")
    }
    assert {k: (int(s), n) for k, (s, n) in got.items()} == want
