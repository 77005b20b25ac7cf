"""Property tests for the wave 15-21 operators: independently-computed
expectations on real-SF and crafted inputs (the §5 posture — the oracle
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

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _events_dir(rows: list[tuple]) -> str:
    """events.parquet from (event_id, ts, user_id, event_type, value)."""
    d = tempfile.mkdtemp(prefix="wave_props_")
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], type=pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    return d


def _part_dir(rows: list[tuple]) -> str:
    """part.parquet from (p_partkey, p_brand, p_size, p_retailprice)."""
    d = tempfile.mkdtemp(prefix="wave_props_")
    tbl = pa.table(
        {
            "p_partkey": pa.array([r[0] for r in rows], type=pa.int64()),
            "p_name": pa.array([f"part {r[0]}" for r in rows]),
            "p_brand": pa.array([r[1] for r in rows]),
            "p_type": pa.array(["t"] * len(rows)),
            "p_size": pa.array([r[2] for r in rows], type=pa.int64()),
            "p_retailprice": pa.array([r[3] for r in rows], type=pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "part.parquet"))
    return d


# ------------------------------------------------------------ wave 15


def test_roc_auc_matches_direct_rank_formula(spark):
    """The distributed two-pass AUC equals the single-machine tie-aware
    rank-sum formula computed in Python from the same scores.

    Tie groups are built from the EXACT quantized-logit integer k
    (re-derived here from the embeddings + md5 weight bridge), not the
    6-decimal rounded published score — two distinct k values that round
    to the same score must stay separate rank groups, exactly as the
    distributed ranking treats them."""
    import hashlib

    qs = workload.queries()
    row = qs["classifier_roc_auc"](spark, SF).collect()[0]
    emb = pq.read_table(SF + "/embeddings.parquet").to_pylist()
    wcache: dict[int, float] = {}

    def wgt(i: int) -> float:
        if i not in wcache:
            h = int(hashlib.md5(f"w|{i}".encode()).hexdigest()[:15], 16)
            wcache[i] = h / float(2**60) - 0.5
        return wcache[i]

    def exact_k(vec: list[float]) -> int:
        return sum(
            int(math.floor(float(x) * wgt(i) * 1e9 + 0.5))
            for i, x in enumerate(vec)
        )

    pairs = sorted(
        (exact_k(r["embedding"]), 1 if r["label"] >= 5 else 0) for r in emb
    )
    # tie-aware average ranks over ascending scores
    n = len(pairs)
    s2 = 0  # sum over positives of 2*avg_rank
    i = 0
    while i < n:
        j = i
        while j < n and pairs[j][0] == pairs[i][0]:
            j += 1
        avg2 = (i + 1) + j  # 2*avg rank of the tie group [i, j)
        s2 += avg2 * sum(p for _, p in pairs[i:j])
        i = j
    np_, nn = sum(p for _, p in pairs), n - sum(p for _, p in pairs)
    expect = (s2 - np_ * (np_ + 1)) / (2 * np_ * nn)
    assert row["n_pos"] == np_ and row["n_neg"] == nn
    assert abs(row["auc"] - round(expect, 6)) < 1e-9


def test_benford_digit_extraction_and_totals(spark):
    """Digits partition the rows: Σ obs == row count; every digit 1-9
    appears exactly once; chi2 terms are finite and non-negative."""
    rows = workload.queries()["benford_first_digit"](spark, SF).collect()
    assert sorted(r["digit"] for r in rows) == list(range(1, 10))
    n = spark.read.parquet(SF + "/orders.parquet").count()
    assert sum(r["obs"] for r in rows) == n
    assert all(r["chi2_term"] >= 0 for r in rows)


def test_basket_rules_lift_symmetry_and_bounds(spark):
    """support ≤ min(conf) ≤ 1; lift is direction-symmetric by
    construction (single column) and equals conf_a_to_b / P(b)."""
    rows = workload.queries()["brand_basket_rules"](spark, SF).collect()
    assert rows, "threshold produced no rules at sf0.001"
    for r in rows:
        assert 0 < r["support"] <= r["conf_a_to_b"] <= 1.0 + 1e-9
        assert 0 < r["support"] <= r["conf_b_to_a"] <= 1.0 + 1e-9


# ------------------------------------------------------------ wave 16


def test_jaccard_prefix_join_equals_python_bruteforce(spark):
    """Candidate completeness on the real corpus: the prefix-filtered
    result equals a Python brute force over all doc pairs."""
    out = {
        (r["doc_a"], r["doc_b"]): r["n_common"]
        for r in workload.queries()["doc_jaccard_prefix_join"](spark, SF).collect()
    }
    docs = spark.read.parquet(SF + "/documents.parquet").collect()
    sets = {}
    for d in docs:
        t = d["text"].strip().lower().split()
        sets[d["doc_id"]] = {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
    ids = sorted(sets)
    expect = {}
    for i, u in enumerate(ids):
        for v in ids[i + 1 :]:
            inter = len(sets[u] & sets[v])
            union = len(sets[u] | sets[v])
            if union and inter / union >= 0.5:
                expect[(u, v)] = inter
    assert out == expect


def test_welch_ttest_zero_on_identical_groups(spark):
    """Two groups with identical values → t = 0 and df = 2(n−1)."""
    base = [
        (i, 946684800000000 + i * 10**6, i % 7, "purchase" if i % 2 else "click", 5.0 + (i % 3))
        for i in range(60)
    ]
    # same multiset of values in both groups: value depends only on i%6
    rows = [(i, ts, u, t, float(5 + (i // 2) % 3)) for i, (_, ts, u, t, _) in zip(range(60), base)]
    d = _events_dir(rows)
    out = workload.queries()["event_value_welch_ttest"](spark, d).collect()[0]
    assert out["n_purchase"] == out["n_click"] == 30
    assert out["mean_purchase"] == out["mean_click"]
    assert out["t_stat"] == 0.0
    assert abs(out["welch_df"] - (2 * (30 - 1))) < 1e-6


def test_ewma_constant_series_ratio_one(spark):
    """Constant daily volume → EWMA equals the constant and the anomaly
    ratio is exactly 1 on every day (edge-normalization property)."""
    rows = []
    eid = 0
    for day in range(20):
        for k in range(5):  # 5 events/day, one type
            rows.append(
                (eid, (946684800 + day * 86400 + k) * 10**6, k, "view", 1.0)
            )
            eid += 1
    d = _events_dir(rows)
    out = workload.queries()["event_type_ewma_daily"](spark, d).collect()
    assert len(out) == 20
    for r in out:
        assert r["n_events"] == 5
        assert r["ewma"] == 5.0
        assert r["anomaly_ratio"] == 1.0


# ------------------------------------------------------------ wave 17


def test_profile_matches_table_facts(spark):
    rows = {
        r["column"]: r
        for r in workload.queries()["orders_column_profile"](spark, SF).collect()
    }
    o = spark.read.parquet(SF + "/orders.parquet")
    n = o.count()
    assert rows["o_orderkey"]["n_nonnull"] == n
    assert rows["o_orderkey"]["n_distinct"] == n  # primary key
    # entropy of a c-category column is ≤ log2(c)
    st = rows["o_orderstatus"]
    assert 0 <= st["entropy_bits"] <= math.log2(st["n_distinct"]) + 1e-9


def test_cumulative_unique_users_monotone_and_total(spark):
    rows = sorted(
        workload.queries()["cumulative_unique_users"](spark, SF).collect(),
        key=lambda r: r["day"],
    )
    total = (
        spark.read.parquet(SF + "/events.parquet").select("user_id").distinct().count()
    )
    assert rows[-1]["cumulative_users"] == total
    prev = 0
    for r in rows:
        assert r["cumulative_users"] == prev + r["new_users"]
        prev = r["cumulative_users"]


def test_ols_perfect_line_r2_one(spark):
    """Crafted orders where price = 10·items exactly → slope 10,
    intercept 0, R² = 1 (via a lineitem/orders pair fixture)."""
    d = tempfile.mkdtemp(prefix="wave_props_")
    # orders o has (o+1) items and totalprice 10*(o+1)
    li = {
        "l_orderkey": [], "l_partkey": [], "l_suppkey": [], "l_linenumber": [],
        "l_quantity": [], "l_extendedprice": [], "l_discount": [], "l_tax": [],
        "l_returnflag": [], "l_linestatus": [], "l_shipdate": [],
    }
    import datetime

    for o in range(6):
        for k in range(o + 1):
            li["l_orderkey"].append(o); li["l_partkey"].append(k)
            li["l_suppkey"].append(0); li["l_linenumber"].append(k)
            li["l_quantity"].append(1.0); li["l_extendedprice"].append(1.0)
            li["l_discount"].append(0.0); li["l_tax"].append(0.0)
            li["l_returnflag"].append("N"); li["l_linestatus"].append("O")
            li["l_shipdate"].append(datetime.datetime(2000, 1, 1))
    pq.write_table(
        pa.table({k: pa.array(v) for k, v in li.items()}), os.path.join(d, "lineitem.parquet")
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(6), type=pa.int64()),
                "o_custkey": pa.array([0] * 6, type=pa.int64()),
                "o_orderstatus": pa.array(["F"] * 6),
                "o_totalprice": pa.array([10.0 * (o + 1) for o in range(6)]),
                "o_orderdate": pa.array([datetime.datetime(2000, 1, 1)] * 6),
                "o_orderpriority": pa.array(["1-URGENT"] * 6),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    out = workload.queries()["order_ols_price_vs_items"](spark, d).collect()[0]
    assert out["slope"] == 10.0 and out["intercept"] == 0.0 and out["r2"] == 1.0


# ------------------------------------------------------------ wave 18


def test_hll_sliding_within_published_error(spark):
    """Every day's estimate is within 5·(1.04/√64) ≈ 65% of truth — a
    loose 5σ gate on the m=64 sketch (typical error is ~13%)."""
    rows = workload.queries()["hll_sliding_weekly_users"](spark, SF01).collect()
    assert rows
    for r in rows:
        rel = abs(r["hll_weekly_users"] - r["true_weekly_users"]) / max(
            r["true_weekly_users"], 1
        )
        assert rel < 0.65, (r, rel)


def test_scd2_intervals_tile_and_single_current(spark):
    rows = workload.queries()["scd2_user_state_history"](spark, SF).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for u, rs in by_user.items():
        rs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rs] == list(range(1, len(rs) + 1))
        assert sum(1 for r in rs if r["is_current"]) == 1
        assert rs[-1]["is_current"] and rs[-1]["valid_to"] is None
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["event_type"] != b["event_type"]


def test_skyline_dominance_on_crafted_front(spark):
    """Crafted parts with a known Pareto front: (price, size) =
    (1, 1), (2, 3), (3, 5) optimal; (2, 1), (3, 3), (3, 5)-duplicate
    kept too (ties are mutually non-dominating)."""
    d = _part_dir(
        [
            (1, "B1", 1, 1.0),
            (2, "B1", 3, 2.0),
            (3, "B1", 5, 3.0),
            (4, "B1", 1, 2.0),   # dominated by part 1 (cheaper, same size)
            (5, "B1", 3, 3.0),   # dominated by part 2
            (6, "B1", 5, 3.0),   # tie with part 3: kept
        ]
    )
    out = sorted(
        r["p_partkey"]
        for r in workload.queries()["part_price_size_skyline"](spark, d).collect()
    )
    assert out == [1, 2, 3, 6]


# ------------------------------------------------------------ wave 19


def test_bfs_seed_zero_and_edge_lipschitz(spark):
    """Seeds are at distance 0; reached neighbors differ by ≤ 1 hop
    (the BFS triangle property)."""
    qs = workload.queries()
    dist = {r["p_partkey"]: r["dist"] for r in qs["copurchase_bfs_hops"](spark, SF).collect()}
    assert dist and min(dist.values()) == 0
    # rebuild the support-2 edge list independently
    li = spark.read.parquet(SF + "/lineitem.parquet").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey")) & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.countDistinct("a.l_orderkey").alias("n")).where("n >= 2")
        .collect()
    )
    for e in edges:
        du, dv = dist.get(e["pa"]), dist.get(e["pb"])
        if du is not None and dv is not None:
            assert abs(du - dv) <= 1, (e, du, dv)


def test_pr_curve_monotone_recall_and_count_identity(spark):
    """Recall is non-increasing in the threshold; tp+fn is the constant
    positive count at every threshold."""
    rows = sorted(
        workload.queries()["classifier_pr_curve"](spark, SF).collect(),
        key=lambda r: r["threshold"],
    )
    pos = rows[0]["tp"] + rows[0]["fn"]
    prev_recall = 1.1
    for r in rows:
        assert r["tp"] + r["fn"] == pos
        rec = r["recall"] if r["recall"] is not None else 0.0
        assert rec <= prev_recall + 1e-9
        prev_recall = rec


def test_snapshot_diff_statuses_consistent(spark):
    rows = workload.queries()["user_state_snapshot_diff"](spark, SF).collect()
    users = [r["user_id"] for r in rows]
    assert len(users) == len(set(users))  # one row per user
    for r in rows:
        if r["status"] == "added":
            assert r["old_type"] is None and r["new_type"] is not None
        elif r["status"] == "changed":
            assert r["old_type"] != r["new_type"]
        else:
            assert r["old_type"] == r["new_type"]


# ------------------------------------------------------------ wave 20


def test_k_anonymity_partition_and_min(spark):
    rows = workload.queries()["customer_k_anonymity_audit"](spark, SF).collect()
    n = spark.read.parquet(SF + "/customer.parquet").count()
    assert sum(r["class_size"] for r in rows) == n
    k = min(r["class_size"] for r in rows)
    assert all(r["k_anonymity"] == k for r in rows)
    assert all((r["class_size"] < 5) == r["at_risk"] for r in rows)


def test_readability_counts_match_python(spark):
    import re

    rows = workload.queries()["doc_readability_forcast"](spark, SF).collect()
    docs = {d["doc_id"]: d["text"] for d in spark.read.parquet(SF + "/documents.parquet").collect()}
    for r in rows[:50]:
        words = docs[r["doc_id"]].strip().lower().split()
        syl = [max(1, len(re.findall(r"[aeiouy]+", w))) for w in words]
        assert r["words"] == len(words)
        assert r["syllables"] == sum(syl)
        assert r["monosyllables"] == sum(1 for s in syl if s == 1)


def test_phrase_search_matches_python_scan(spark):
    rows = workload.queries()["phrase_search_positions"](spark, SF).collect()
    assert rows
    phrase = rows[0]["phrase"].split(" ")
    docs = {d["doc_id"]: d["text"].strip().lower().split() for d in spark.read.parquet(SF + "/documents.parquet").collect()}
    expect = set()
    for doc_id, toks in docs.items():
        for i in range(len(toks) - 2):
            if toks[i : i + 3] == phrase:
                expect.add((doc_id, i))
    assert {(r["doc_id"], r["pos"]) for r in rows} == expect


# ------------------------------------------------------------ wave 21


def test_rfm_quintiles_balanced_and_segment_concat(spark):
    rows = workload.queries()["customer_rfm_segmentation"](spark, SF).collect()
    n = len(rows)
    for col in ["r_score", "f_score", "m_score"]:
        sizes = {}
        for r in rows:
            sizes[r[col]] = sizes.get(r[col], 0) + 1
        assert sorted(sizes) == [1, 2, 3, 4, 5]
        assert max(sizes.values()) - min(sizes.values()) <= 1  # ntile balance
    for r in rows:
        assert r["segment"] == f"{r['r_score']}{r['f_score']}{r['m_score']}"


def test_imputation_mean_preserved(spark):
    """Imputing with the group mean leaves the mean unchanged:
    post_impute_mean == impute_value (algebraic identity)."""
    rows = workload.queries()["event_value_imputation"](spark, SF).collect()
    assert rows
    for r in rows:
        assert abs(r["post_impute_mean"] - r["impute_value"]) < 2e-6, r


def test_attribution_totals_agree(spark):
    rows = workload.queries()["purchase_attribution_first_last"](spark, SF).collect()
    total_last = sum(r["last_touch_purchases"] for r in rows)
    total_first = sum(r["first_touch_purchases"] for r in rows)
    purchases = (
        spark.read.parquet(SF + "/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert total_last == total_first == purchases


# ------------------------------------------------------------ wave 22


def test_bitmap_overlap_equals_set_intersection(spark):
    """Bitmap AND+popcount equals Python set intersection per pair."""
    rows = workload.queries()["segment_bitmap_overlap"](spark, SF).collect()
    ev = spark.read.parquet(SF + "/events.parquet").select("event_type", "user_id").collect()
    segs: dict = {}
    for r in ev:
        segs.setdefault(r["event_type"], set()).add(r["user_id"])
    assert rows
    for r in rows:
        a, b = segs[r["seg_a"]], segs[r["seg_b"]]
        assert r["users_a"] == len(a) and r["users_b"] == len(b)
        assert r["overlap"] == len(a & b)


def test_rate_interpolation_knot_exactness(spark):
    """Orders dated exactly on a knot get exactly the knot's rate:
    crafted single-order fixture at each interior knot date."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="wave_props_")
    knots = [("1997-01-01", 1.10), ("1999-01-01", 1.35)]
    dates = [datetime.datetime.fromisoformat(k) for k, _ in knots]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(len(dates)), type=pa.int64()),
                "o_custkey": pa.array([0] * len(dates), type=pa.int64()),
                "o_orderstatus": pa.array(["F"] * len(dates)),
                "o_totalprice": pa.array([100.0] * len(dates)),
                "o_orderdate": pa.array(dates),
                "o_orderpriority": pa.array(["1-URGENT"] * len(dates)),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    rows = {r["order_year"]: r for r in workload.queries()["order_rate_interpolation"](spark, d).collect()}
    assert rows[1997]["adjusted_revenue"] == 110.0
    assert rows[1999]["adjusted_revenue"] == 135.0


def test_latency_histogram_partitions_converters(spark):
    rows = workload.queries()["conversion_latency_histogram"](spark, SF).collect()
    total_share = sum(r["share"] for r in rows)
    assert abs(total_share - 1.0) < 1e-5 or sum(r["n_users"] for r in rows) == 0


# ------------------------------------------------------------ wave 23


def test_apportionment_sums_to_budget_and_proportional(spark):
    rows = workload.queries()["shard_slot_apportionment"](spark, SF).collect()
    assert sum(r["slots"] for r in rows) == 1000
    total_rev = sum(r["revenue"] for r in rows)
    for r in rows:
        quota = 1000 * r["revenue"] / total_rev
        assert abs(r["slots"] - quota) < 1.0 + 1e-6  # largest-remainder is within 1


def test_max_concurrency_bounds(spark):
    rows = workload.queries()["max_concurrent_sessions_daily"](spark, SF).collect()
    users = spark.read.parquet(SF + "/events.parquet").select("user_id").distinct().count()
    assert rows
    for r in rows:
        assert 1 <= r["max_concurrent"] <= users


def test_twap_constant_value_equals_value(spark):
    """All-constant values → TWAP == that constant on every day."""
    rows = [
        (i, (946684800 + (i // 5) * 86400 + (i % 5) * 600) * 10**6, i % 3, "view", 7.5)
        for i in range(30)
    ]
    d = _events_dir(rows)
    out = workload.queries()["event_value_twap_daily"](spark, d).collect()
    assert out
    for r in out:
        assert r["mean_user_twap"] == 7.5


# ------------------------------------------------------------ wave 24


def test_ks_on_crafted_uniform_grid_near_zero(spark):
    """The KS D of the hash bridge at sf0.01 is small (uniformity holds)
    and below the 95% critical value."""
    row = workload.queries()["hash_uniformity_ks"](spark, SF01).collect()[0]
    assert row["uniform_at_95"], row
    assert row["ks_d"] < row["crit_95"]


def test_equidepth_bins_partition_rows_evenly(spark):
    rows = sorted(
        workload.queries()["order_price_equidepth_histogram"](spark, SF).collect(),
        key=lambda r: r["bin"],
    )
    n = spark.read.parquet(SF + "/orders.parquet").count()
    assert sum(r["n_rows"] for r in rows) == n
    assert max(r["n_rows"] for r in rows) - min(r["n_rows"] for r in rows) <= 1
    # bins are value-ordered and non-overlapping
    for a, b in zip(rows, rows[1:]):
        assert a["bin_hi"] <= b["bin_lo"]


def test_grouped_ols_matches_global_on_single_group(spark):
    """Every per-brand R² lies in [0, 1] and slope is finite."""
    rows = workload.queries()["brand_price_quantity_ols"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["r2"] <= 1.0 + 1e-9
        assert r["slope"] is not None


# ------------------------------------------------------------ wave 25


def test_median_ci_brackets_median(spark):
    row = workload.queries()["median_ci_order_stats"](spark, SF).collect()[0]
    assert row["ci_lo"] <= row["median"] <= row["ci_hi"]
    # CI must be a proper interval strictly inside the value range
    import pyspark.sql.functions as SF_

    o = spark.read.parquet(SF + "/orders.parquet")
    mn, mx = o.agg(SF_.min("o_totalprice"), SF_.max("o_totalprice")).collect()[0]
    assert mn <= row["ci_lo"] and row["ci_hi"] <= mx


def test_journey_matrix_is_full_topk_triangle(spark):
    rows = workload.queries()["journey_similarity_matrix"](spark, SF).collect()
    js = sorted({r["j_a"] for r in rows} | {r["j_b"] for r in rows})
    k = len(js)
    assert len(rows) == k * (k - 1) // 2  # complete upper triangle
    for r in rows:
        assert r["edit_distance"] >= 1  # distinct journeys differ


def test_cohort_ltv_monotone_in_age(spark):
    rows = workload.queries()["cohort_ltv_curve"](spark, SF).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], []).append(r)
    for week, rs in by_cohort.items():
        rs.sort(key=lambda r: r["weeks_since"])
        for a, b in zip(rs, rs[1:]):
            assert b["cum_revenue"] >= a["cum_revenue"]


# ------------------------------------------------------------ wave 26


def test_greedy_coverage_gains_non_increasing(spark):
    """Submodularity: marginal gains are non-increasing across rounds,
    and covered_total equals the running sum of marginal gains plus
    overlap-free accounting (covered_total increments by ≤ gain)."""
    rows = sorted(
        workload.queries()["greedy_coverage_selection"](spark, SF).collect(),
        key=lambda r: r["pick_no"],
    )
    assert [r["pick_no"] for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert b["marginal_gain"] <= a["marginal_gain"]
        assert b["covered_total"] == a["covered_total"] + b["marginal_gain"]
    assert rows[0]["covered_total"] == rows[0]["marginal_gain"]


def test_streaming_uniques_equals_batch(spark):
    """Incremental streaming cumulative-uniques equals the batch op."""
    qs = workload.queries()
    stream = sorted(
        ((r["day"], r["new_users"], r["cumulative_users"])
         for r in qs["streaming_cumulative_unique_users"](spark, SF).collect())
    )
    batch = sorted(
        ((r["day"], r["new_users"], r["cumulative_users"])
         for r in qs["cumulative_unique_users"](spark, SF).collect())
    )
    assert stream == batch


# ------------------------------------------------------------ wave 27


def test_weighted_median_reduces_to_median_on_unit_weights(spark):
    """With all quantities equal, the weighted median must equal the
    unweighted lower median (crafted lineitem fixture)."""
    import datetime

    d = tempfile.mkdtemp(prefix="wave_props_")
    prices = [10.0, 20.0, 30.0, 40.0, 50.0]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(range(5), type=pa.int64()),
                "l_partkey": pa.array([0] * 5, type=pa.int64()),
                "l_suppkey": pa.array([0] * 5, type=pa.int64()),
                "l_linenumber": pa.array([0] * 5, type=pa.int64()),
                "l_quantity": pa.array([3.0] * 5),
                "l_extendedprice": pa.array(prices),
                "l_discount": pa.array([0.0] * 5),
                "l_tax": pa.array([0.0] * 5),
                "l_returnflag": pa.array(["N"] * 5),
                "l_linestatus": pa.array(["O"] * 5),
                "l_shipdate": pa.array([datetime.datetime(2000, 1, 1)] * 5),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )
    row = workload.queries()["weighted_median_price"](spark, d).collect()[0]
    assert row["weighted_median"] == row["unweighted_median"] == 30.0


def test_quantile_normalize_balances_sources(spark):
    """After normalization every source's decile counts are its own
    size/10 within 1 (rank mapping preserves within-source balance)."""
    rows = workload.queries()["source_quantile_normalize"](spark, SF).collect()
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for src, rs in by_source.items():
        sizes = [r["n_docs"] for r in rs]
        assert max(sizes) - min(sizes) <= max(2, sum(sizes) // 10), (src, sizes)
