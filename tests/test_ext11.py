"""Wave-5 operator properties beyond oracle parity: k-core convergence,
an independent Python reference for the interval-island merge, KMV
estimator accuracy vs exact ground truth, and covariance-matrix sanity
against numpy.
"""

from __future__ import annotations

import duckdb
import numpy as np

from nbi_oedi_etl_spark import workload_ext11 as ext11

from .conftest import SF_ORACLE, SF_SMALL


def test_kcore_peel_has_converged(spark):
    """8 peel rounds must reach the FIXED POINT at test scale — otherwise
    the query output is a truncation, not the 2-core. Reference: pure
    Python peeling to convergence on the same duckdb-derived edge list."""
    edges = duckdb.sql(
        f"""
        SELECT a.l_partkey, b.l_partkey
        FROM read_parquet('{SF_ORACLE}/lineitem.parquet') a
        JOIN read_parquet('{SF_ORACLE}/lineitem.parquet') b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2
        """
    ).fetchall()
    es = set(edges)
    rounds = 0
    while True:
        deg: dict[int, int] = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        alive = {n for n, d in deg.items() if d >= ext11._KCORE_K}
        nxt = {(a, b) for a, b in es if a in alive and b in alive}
        if nxt == es:
            break
        es = nxt
        rounds += 1
    assert rounds <= ext11._KCORE_ROUNDS, (
        f"peeling needs {rounds} rounds at {SF_ORACLE}; raise _KCORE_ROUNDS"
    )
    got = {
        (r["part"], r["deg"])
        for r in ext11.copurchase_kcore(spark, SF_ORACLE).collect()
    }
    want: dict[int, int] = {}
    for a, b in es:
        want[a] = want.get(a, 0) + 1
        want[b] = want.get(b, 0) + 1
    assert got == set(want.items())


def test_busy_intervals_matches_python_reference(spark):
    """Independent imperative island merge (sort + linear scan with a
    running max) over the same intervals."""
    rows = duckdb.sql(
        f"""
        SELECT l_suppkey, CAST(l_shipdate AS DATE) AS s,
               CAST(l_shipdate AS DATE) + (CAST(l_quantity AS INTEGER) % 15) AS e
        FROM read_parquet('{SF_SMALL}/lineitem.parquet')
        """
    ).fetchall()
    per: dict[int, list[tuple]] = {}
    for k, s, e in rows:
        per.setdefault(k, []).append((s, e))
    want = {}
    for k, ivs in per.items():
        ivs.sort()
        islands = []
        cur_s, cur_e = ivs[0]
        n = 1
        for s, e in ivs[1:]:
            if s > cur_e:
                islands.append((cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e = max(cur_e, e)
                n += 1
        islands.append((cur_s, cur_e, n))
        want[k] = (
            sum(i[2] for i in islands),
            len(islands),
            sum((i[1] - i[0]).days + 1 for i in islands),
            max((i[1] - i[0]).days + 1 for i in islands),
        )
    got = {
        r["l_suppkey"]: (
            r["n_intervals"], r["n_islands"], r["covered_days"],
            r["longest_island_days"],
        )
        for r in ext11.supplier_busy_intervals(spark, SF_SMALL).collect()
    }
    assert got == want


def test_kmv_estimates_track_exact_ground_truth(spark):
    """The KMV estimator is deterministic; this guards its RELATION to
    ground truth: Jaccard estimates within 4σ(k=16) of exact, union
    estimates within 4/√(k-1) relative error, and the small-union branch
    (|U| < k) exactly equal to the true union size."""
    out = ext11.kmv_source_overlap(spark, SF_ORACLE).collect()
    assert len(out) > 0
    sizes = dict(
        duckdb.sql(
            f"""
            SELECT source, count(DISTINCT tok) FROM (
              SELECT source, unnest(string_split(lower(trim(text)), ' ')) tok
              FROM read_parquet('{SF_ORACLE}/documents.parquet')
            ) WHERE tok <> '' GROUP BY source
            """
        ).fetchall()
    )
    unions = dict(
        (
            (r[0], r[1]),
            r[2],
        )
        for r in duckdb.sql(
            f"""
            WITH t AS (
              SELECT DISTINCT source, tok FROM (
                SELECT source, unnest(string_split(lower(trim(text)), ' ')) tok
                FROM read_parquet('{SF_ORACLE}/documents.parquet')
              ) WHERE tok <> ''
            )
            SELECT a.sa, a.sb, count(DISTINCT a.tok) FROM (
              SELECT x.source sa, y.source sb, t1.tok
              FROM (SELECT DISTINCT source FROM t) x
              JOIN (SELECT DISTINCT source FROM t) y ON x.source < y.source
              JOIN t t1 ON t1.source IN (x.source, y.source)
            ) a GROUP BY 1, 2
            """
        ).fetchall()
    )
    k = ext11._KMV_K
    saw_theta_branch = False
    for r in out:
        true_union = unions[(r["sa"], r["sb"])]
        assert abs(r["est_jaccard"] - r["exact_jaccard"]) <= 4 * np.sqrt(
            0.25 / k
        ), r
        if r["k_used"] < k:
            assert r["est_union"] == float(true_union), r
        else:
            saw_theta_branch = True
            assert abs(r["est_union"] - true_union) <= 4 * true_union / np.sqrt(
                k - 1
            ), (r, true_union)
    assert saw_theta_branch, "k too large: estimator branch never exercised"
    _ = sizes  # sizes retained for debuggability on failure


def test_embedding_covariance_matches_numpy(spark):
    """The decimal-sum covariance must agree with numpy's float64
    covariance to the quantization tolerance, correlations must be in
    [-1, 1], and the diagonal must be a valid variance."""
    out = ext11.embedding_covariance(spark, SF_SMALL).collect()
    mat = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{SF_SMALL}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    X = np.array([list(r[0]) for r in mat], dtype=np.float64)
    n, d = X.shape
    ref = np.cov(X, rowvar=False, bias=True)
    assert len(out) == d * (d + 1) // 2
    for r in out:
        assert r["n"] == n
        assert abs(r["cov"] - ref[r["i"], r["j"]]) < 1e-7, r
        if r["i"] == r["j"]:
            assert r["cov"] >= 0
            assert abs(r["corr"] - 1.0) < 1e-5
        if r["corr"] is not None:
            assert -1.000001 <= r["corr"] <= 1.000001


def test_lexical_diversity_invariants(spark):
    out = ext11.doc_lexical_diversity(spark, SF_SMALL).collect()
    assert len(out) > 0
    for r in out:
        assert 1 <= r["n_hapax"] or r["n_hapax"] == 0
        assert r["n_hapax"] <= r["n_types"] <= r["n_tokens"]
        assert 0 < r["ttr"] <= 1.0
        assert r["mean_tok_len"] > 0
