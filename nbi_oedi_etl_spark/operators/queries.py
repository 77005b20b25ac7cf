"""The reference's analytic query shapes (sql/saved-queries.sql) as
reusable DataFrame builders.

The reference ships exactly three saved Athena queries (SURVEY.md §3.3):

- Q1 (saved-queries.sql:12-17): dimension ⋈ fact equi-join + equality
  filters + global COUNT(DISTINCT key).
- Q2 (saved-queries.sql:20-26): same join, COUNT(DISTINCT key) grouped by a
  dimension attribute.
- Q3 (saved-queries.sql:29-45): CTE → SELECT DISTINCT → ROW_NUMBER() OVER
  (PARTITION BY group ORDER BY key) → filter group + rn <= k.

Scale notes: the join is always dimension(small) ⋈ fact(large) — the exact
join the reference refuses to materialize at ETL time (README.md:127,220).
We broadcast the dimension side explicitly so the fact side never shuffles
(Athena/Trino does the same: replicated build side). COUNT(DISTINCT) is kept
EXACT — parity semantics (saved-queries.sql:12) — which at scale is a
two-phase shuffle; ``approx_count_distinct`` is exposed as a separately-named
variant so the two are never conflated (SURVEY.md §7.4.5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.functions.scalars import dotted


def _dcol(df: DataFrame, name: str) -> Column:
    """Dataframe-bound column reference that survives dotted flat names
    (SURVEY.md §7.4.1): ``df["in.x"]`` would parse ``.x`` as struct access,
    so dotted names are backtick-quoted. Stays df-bound (unlike a bare
    ``F.col``) so join-side disambiguation keeps working."""
    return df[f"`{name}`"] if "." in name else df[name]


def _filtered_join(
    dim: DataFrame,
    fact: DataFrame,
    dim_key: str,
    fact_key: str,
    filters: dict[str, object] | None = None,
) -> DataFrame:
    """dimension ⋈ fact inner equi-join with dimension-side equality filters,
    dimension side broadcast (J1, saved-queries.sql:14)."""
    if filters:
        for c, v in filters.items():
            dim = dim.where(dotted(c) == F.lit(v))
    return fact.join(F.broadcast(dim), _dcol(dim, dim_key) == _dcol(fact, fact_key), "inner")


def count_distinct_joined(
    dim: DataFrame,
    fact: DataFrame,
    dim_key: str,
    fact_key: str,
    filters: dict[str, object] | None = None,
    out_name: str = "total_buildings",
    approximate: bool = False,
) -> DataFrame:
    """Q1 shape: join + filters + global COUNT(DISTINCT dim_key)."""
    joined = _filtered_join(dim, fact, dim_key, fact_key, filters)
    agg = (
        F.approx_count_distinct(_dcol(dim, dim_key))
        if approximate
        else F.countDistinct(_dcol(dim, dim_key))
    )
    return joined.agg(agg.alias(out_name))


def grouped_count_distinct_joined(
    dim: DataFrame,
    fact: DataFrame,
    dim_key: str,
    fact_key: str,
    group_col: str,
    filters: dict[str, object] | None = None,
    out_name: str = "total_buildings",
) -> DataFrame:
    """Q2 shape: join + COUNT(DISTINCT dim_key) GROUP BY group_col."""
    joined = _filtered_join(dim, fact, dim_key, fact_key, filters)
    return joined.groupBy(_dcol(dim, group_col)).agg(
        F.countDistinct(_dcol(dim, dim_key)).alias(out_name)
    )


def topk_per_group_joined(
    dim: DataFrame,
    fact: DataFrame,
    dim_key: str,
    fact_key: str,
    group_col: str,
    k: int,
    group_value: object | None = None,
    rn_name: str = "rn",
) -> DataFrame:
    """Q3 shape: DISTINCT (dim_key, group_col) over the join, then
    ROW_NUMBER() PARTITION BY group ORDER BY key, filtered to rn <= k.

    Catalyst rewrites the rn<=k filter into WindowGroupLimit (Spark ≥3.5) so
    each shuffle partition only keeps k rows — top-k never materializes the
    full rank (SURVEY.md §2.5).
    """
    joined = _filtered_join(dim, fact, dim_key, fact_key)
    distinct = joined.select(
        _dcol(dim, dim_key).alias(dim_key), _dcol(dim, group_col).alias(group_col)
    ).distinct()
    w = Window.partitionBy(dotted(group_col)).orderBy(dotted(dim_key))
    ranked = distinct.withColumn(rn_name, F.row_number().over(w))
    out = ranked.where(F.col(rn_name) <= k)
    if group_value is not None:
        out = out.where(dotted(group_col) == F.lit(group_value))
    return out


def distinct_rows(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """E2: SELECT DISTINCT over a column subset (saved-queries.sql:30,41-42)."""
    return df.select(*[dotted(c) for c in cols]).distinct()


def top_n_global(
    df: DataFrame, order: Sequence[Column], n: int, cols: Sequence[str] | None = None
) -> DataFrame:
    """Global sort + limit — Catalyst plans TakeOrderedAndProject, which is a
    per-partition top-n + single-reduce merge (no full sort at scale)."""
    out = df.orderBy(*order).limit(n)
    if cols:
        out = out.select(*[dotted(c) for c in cols])
    return out
