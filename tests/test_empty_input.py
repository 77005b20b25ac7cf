"""Empty-input robustness: queries must degrade to empty/NULL results on
a 0-row dataset, never throw (ANSI divide-by-zero, None-subscript, and
empty-numpy-axis errors were all found and fixed by the full 157-query
empty sweep; this pins the three fixed sites plus one representative per
operator family — the full sweep lives in the session log, rerunnable via
the same recipe).
"""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
import pytest

from nbi_oedi_etl_spark import workload

_REPRESENTATIVES = [
    # the three formerly-failing sites
    "event_funnel_conversion",      # ANSI DIVIDE_BY_ZERO on n_users=0
    "embedding_ann_portable",       # first() is None on empty corpus
    "embedding_ivf_topk",           # numpy axis error on empty centroid sample
    # one per family
    "flagship_hourly_resample",
    "pricing_summary",
    "q9_profit_by_nation_year",
    "exact_dedup_docs",
    "minhash_lsh_portable",
    "doc_tfidf_top_terms",
    "char_bigram_lm_score",
    "nation_trade_pagerank",
    "scd1_merge_orders",
    "data_quality_report",
    "quantile_sketch_order_price",
    "hll_tokens_by_source",
    "copurchase_triangles",
    "weighted_reservoir_docs",
    # round 10: at-rest banded layout — an EMPTY corpus layout has no
    # partition dirs; the probe must read it with the batch's band-row
    # schema instead of failing parquet schema inference
    "banded_layout_portable",
    # round 10: concat-and-cut packing — the zero-token exclusion and
    # the COALESCE'd cumsum must degrade to an empty frame, and the
    # slice explode must not divide-by-zero on an empty stream
    "corpus_pack_sequences",
    "corpus_pack_slices",
    # round 11: duplicate spans — size(toks)>=k filter on an empty/short
    # corpus must yield an empty frame, not a negative sequence() bound;
    # the cut twin additionally right-joins kept tokens back (empty-safe
    # coalesce of kept_text)
    "doc_duplicate_spans",
    "doc_cut_duplicate_spans",
    # round 11: packing companions — empty slices group to an empty
    # frame; the mixture's 1-row normalization cross-join over an empty
    # aggregate must yield no rows, not a divide-by-null
    "pack_boundary_stats",
    "source_temperature_mixture",
    "benchmark_contamination_spans",
    # round 5: mapInPandas codec path on a 0-row documents table
    "multimodal_jpeg_features",
    # round 5: heartbeat sentinels must synthesize template rows when the
    # source is 0-row (found by the full 240-query empty sweep)
    "streaming_click_purchase_left_join",
    "stateful_session_stats",
    # wave 6: plan-build-time ln(count) literals are the hazard class
    "doc_sparse_cosine_pairs",
    "winnowing_fingerprints",
    "token_pmi_bigrams",
    "source_lang_kl_drift",
    "semantic_dedup_cells",
    # waves 9-12: driver-side collects (BPE merges), single-row aggregates
    # (A/B test), and boundary probes (keyset) are the hazard classes
    "event_value_psi_drift",
    "table_content_digest",
    "bpe_apply_merges",
    "purchase_conversion_ab_test",
    "orders_keyset_pagination",
    "order_price_percentiles_cont",
    "part_golden_records",
    "resample_incremental_merge",
    # wave 15: n_baskets=0 / n_pos·n_neg=0 / n_total=0 divisions are the
    # hazard class (AUC and Benford divide by corpus-dependent counts)
    "brand_basket_rules",
    "classifier_roc_auc",
    "benford_first_digit",
    # wave 16: empty-group t-test (n−1=−1 divisions on missing groups)
    # and empty-corpus prefix windows are the hazard class
    "doc_jaccard_prefix_join",
    "event_value_welch_ttest",
    "event_type_ewma_daily",
    # wave 17: entropy ln(0/0), OLS var_x=0 division, empty-calendar
    # windows are the hazard class
    "orders_column_profile",
    "cumulative_unique_users",
    "order_ols_price_vs_items",
    # wave 18: empty register grids (0/0 harmonic fold), empty windows
    "hll_sliding_weekly_users",
    "scd2_user_state_history",
    "part_price_size_skyline",
    # wave 19: empty seed frontier (iterative loop over 0 rows), all-null
    # PR counters, full-outer diff of two empty snapshots
    "copurchase_bfs_hops",
    "classifier_pr_curve",
    "user_state_snapshot_diff",
    # wave 20: empty-corpus phrase selection (guarded collect), 0-word
    # docs, share divisions by n_total=0
    "customer_k_anonymity_audit",
    "doc_readability_forcast",
    "phrase_search_positions",
    # wave 21: n_present=0 impute division, empty ntile windows,
    # full-outer of two empty attribution sides
    "customer_rfm_segmentation",
    "event_value_imputation",
    "purchase_attribution_first_last",
    # wave 22: empty bitmaps, empty-range interpolation join, n_tot=0
    # latency share
    "segment_bitmap_overlap",
    "order_rate_interpolation",
    "conversion_latency_histogram",
    # wave 23: total=0 quota division, empty sweep stream, empty windows
    "shard_slot_apportionment",
    "max_concurrent_sessions_daily",
    "event_value_twap_daily",
    # wave 24: n=0 critical value (1.358/sqrt(0)), empty bin intervals,
    # per-group var_x=0 regression divisions
    "hash_uniformity_ks",
    "order_price_equidepth_histogram",
    "brand_price_quantity_ols",
    # wave 25: n=0 early return, empty journey vocabulary, empty cohorts
    "median_ci_order_stats",
    "journey_similarity_matrix",
    "cohort_ltv_curve",
    # wave 26: empty greedy rounds (no top row → early break), empty
    # stream batches
    "greedy_coverage_selection",
    # wave 27: total_c=0 early return, n_tot=0 early return
    "weighted_median_price",
    "source_quantile_normalize",
    # round 9: two-pass spine family — empty spine (no buckets), empty
    # prefix windows, empty broadcast side
    "spine_user_sessions",
    "spine_running_value_sum",
    "spine_event_rank",
    "spine_global_running_value_sum",
    "spine_global_event_rank",
]


@pytest.fixture(scope="module")
def empty_sf_dir() -> str:
    src = "/root/testdata/sf0.001"
    d = tempfile.mkdtemp(prefix="empty_sf_")
    for p in glob.glob(src + "/*.parquet"):
        pq.write_table(pq.read_table(p).slice(0, 0), os.path.join(d, os.path.basename(p)))
    return d


@pytest.mark.parametrize("name", _REPRESENTATIVES)
def test_query_survives_empty_input(spark, empty_sf_dir, name):
    rows = workload.queries()[name](spark, empty_sf_dir).collect()
    assert isinstance(rows, list)  # empty or NULL-rowed results are both fine


# ---- degenerate single-row inputs (n-1 / single-class divisions) ----
#
# The full 240-query 1-row sweep (round 5) found three ANSI
# DIVIDE_BY_ZERO aborts: a single-day event type (z-score variance /
# (n_days-1)), a single-class corpus (AUC / 2·np·nn), and an empty A/B
# segment (rate / n). All three now yield NULL statistics instead.

_ONE_ROW_REPRESENTATIVES = [
    "event_value_anomalies",
    "classifier_roc_auc",
    "purchase_conversion_ab_test",
]


@pytest.fixture(scope="module")
def one_row_sf_dir() -> str:
    src = "/root/testdata/sf0.001"
    d = tempfile.mkdtemp(prefix="one_row_sf_")
    for p in glob.glob(src + "/*.parquet"):
        pq.write_table(pq.read_table(p).slice(0, 1), os.path.join(d, os.path.basename(p)))
    return d


@pytest.mark.parametrize("name", _ONE_ROW_REPRESENTATIVES)
def test_query_survives_single_row_input(spark, one_row_sf_dir, name):
    rows = workload.queries()[name](spark, one_row_sf_dir).collect()
    assert isinstance(rows, list)


# ---- all-duplicates corpus (dense clique / zero-gap degeneracy) ----
#
# The full 240-query all-duplicates sweep (round 5: every document text
# identical, every event same user+timestamp) found two aborts:
# burstiness (σ−μ)/(σ+μ) = 0/0 on zero gaps, and the recursive-CTE
# closure exceeding Spark's default 1M recursion-row cap on the
# 500-doc duplicate clique (Σ|component|² rows). Both fixed: NULL
# burstiness; a raised cap on the query's scoped session.

import pyarrow as pa


@pytest.fixture(scope="module")
def clique_sf_dir() -> str:
    src = "/root/testdata/sf0.001"
    d = tempfile.mkdtemp(prefix="clique_sf_")
    for p in glob.glob(src + "/*.parquet"):
        t = pq.read_table(p)
        name = os.path.basename(p)
        if name == "documents.parquet":
            txt = t.column("text")[0].as_py()
            t = t.set_column(
                t.schema.get_field_index("text"),
                t.schema.field("text"),
                pa.array([txt] * len(t), type=t.schema.field("text").type),
            )
        elif name == "events.parquet":
            for fld in ("user_id", "ts"):
                v = t.column(fld)[0].as_py()
                t = t.set_column(
                    t.schema.get_field_index(fld),
                    t.schema.field(fld),
                    pa.array([v] * len(t), type=t.schema.field(fld).type),
                )
        pq.write_table(t, os.path.join(d, name))
    return d


@pytest.mark.parametrize(
    "name", ["user_interarrival_stats", "near_dup_clusters_recursive_sql"]
)
def test_query_survives_all_duplicates_corpus(spark, clique_sf_dir, name):
    rows = workload.queries()[name](spark, clique_sf_dir).collect()
    assert isinstance(rows, list)


# ---- null text/value/props columns (nullable-schema corpora) ----
#
# The full 240-query null-columns sweep (round 5: documents.text,
# events.value, events.props all NULL) found two Python-worker crashes:
# unicodedata.normalize(None) in the NFC pandas_udf, and bytes(None) in
# the frame sampler. Every codec/UDF path is now null-safe (NULL result
# or quarantine drop).

_NULL_COLS = {"documents.parquet": ["text"], "events.parquet": ["value", "props"]}


@pytest.fixture(scope="module")
def null_cols_sf_dir() -> str:
    src = "/root/testdata/sf0.001"
    d = tempfile.mkdtemp(prefix="null_cols_sf_")
    for p in glob.glob(src + "/*.parquet"):
        t = pq.read_table(p)
        for c in _NULL_COLS.get(os.path.basename(p), []):
            i = t.schema.get_field_index(c)
            t = t.set_column(i, t.schema.field(c), pa.nulls(len(t), type=t.schema.field(c).type))
        pq.write_table(t, os.path.join(d, os.path.basename(p)))
    return d


@pytest.mark.parametrize(
    "name",
    ["doc_unicode_normalize", "multimodal_frame_sample", "multimodal_image_features"],
)
def test_query_survives_null_columns(spark, null_cols_sf_dir, name):
    rows = workload.queries()[name](spark, null_cols_sf_dir).collect()
    assert isinstance(rows, list)


# ---- empty-input PARITY (not just no-crash) -------------------------
#
# Round-5 advice: the melt-based orders_column_profile silently diverged
# from its oracle on a 0-row table (0 rows vs the oracle's always-6),
# and the no-crash sweep above couldn't see it. Pin full cross-engine
# parity on the empty corpus for the profile (fixed via a static
# column-name frame) plus the aggregate-shaped representatives whose
# oracles also emit rows unconditionally.

_EMPTY_PARITY_REPRESENTATIVES = [
    "orders_column_profile",
    "ref_q1_count_distinct",
    "table_content_digest",
    # round 9: spine family oracle parity on zero rows (full 5-shape
    # degenerate sweep ran green in-session; this pins the empty leg)
    "spine_user_sessions",
    "spine_running_value_sum",
    "spine_event_rank",
    "spine_global_running_value_sum",
    "spine_global_event_rank",
]


@pytest.mark.parametrize("name", _EMPTY_PARITY_REPRESENTATIVES)
def test_empty_input_matches_oracle(spark, empty_sf_dir, name):
    import duckdb

    from .conftest import assert_oracle_match

    con = duckdb.connect()
    for p in glob.glob(empty_sf_dir + "/*.parquet"):
        t = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    spec = {s.name: s for s in workload.SPECS}[name]
    assert_oracle_match(spec.fn(spark, empty_sf_dir), con, spec.oracle)
