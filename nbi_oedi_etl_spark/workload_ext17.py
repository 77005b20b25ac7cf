"""Round-4 extension queries, wave 11: whole-schema integrity auditing,
interpolated percentile aggregates, and pagination access patterns.

- ``referential_integrity_matrix`` — orphan-rate audit of EVERY foreign
  key in the schema in one result: the whole-schema extension of
  data_quality_report's single-pair RI check.
- ``order_price_percentiles_cont`` — percentile_cont (linear
  interpolation between order statistics) at p25/p50/p75/p90 per order
  priority, formulated exactly: the interpolation fraction is a
  RATIONAL in (n, p) and the bracketing order statistics are exact
  decimals, so even interpolated percentiles value-hash-check.
- ``orders_keyset_pagination`` — keyset (seek-method) pagination vs
  OFFSET: page 4 of the orders feed ordered by (totalprice DESC,
  orderkey), fetched by WHERE-tuple-seek. The access pattern every API
  backend needs; OFFSET shifts the whole prefix through the executor,
  keyset prunes it at the scan.

Oracle convention identical to workload.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table

# -------------------------------------- whole-schema RI orphan audit


def referential_integrity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-rate audit of every foreign-key edge in the schema —
    (relationship, fk_rows, orphan_rows) for orders→customer,
    lineitem→orders, lineitem→part, lineitem→supplier, customer→nation,
    supplier→nation, nation→region — in ONE result set. The
    whole-schema RI sweep a warehouse runs after each load
    (data_quality_report proves the single-edge mechanism; this is the
    fleet version).

    Plan/scale: each edge is a LEFT ANTI join counting misses; dimension
    parents broadcast, fact-fact edges (lineitem→orders) shuffle on the
    key once. Edges are independent — Spark schedules them as parallel
    jobs under one union; each edge's cost is its own join, there is no
    cross-edge barrier.
    """
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    c = read_table(spark, sf_dir, "customer")
    p = read_table(spark, sf_dir, "part")
    su = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")

    def edge(name: str, child: DataFrame, key, parent: DataFrame, pkey) -> DataFrame:
        total = child.agg(F.count(F.lit(1)).alias("fk_rows")).withColumn(
            "relationship", F.lit(name)
        )
        orphans = (
            child.join(parent, child[key] == parent[pkey], "left_anti")
            .agg(F.count(F.lit(1)).alias("orphan_rows"))
            .withColumn("relationship", F.lit(name))
        )
        return total.join(orphans, "relationship")

    edges = [
        edge("orders->customer", o, "o_custkey", c, "c_custkey"),
        edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
        edge("lineitem->part", li, "l_partkey", p, "p_partkey"),
        edge("lineitem->supplier", li, "l_suppkey", su, "s_suppkey"),
        edge("customer->nation", c, "c_nationkey", n, "n_nationkey"),
        edge("supplier->nation", su, "s_nationkey", n, "n_nationkey"),
        edge("nation->region", n, "n_regionkey", r, "r_regionkey"),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionByName(e)
    return out.select("relationship", "fk_rows", "orphan_rows")


RI_MATRIX_ORACLE = """
SELECT 'orders->customer' AS relationship,
       (SELECT count(*) FROM orders) AS fk_rows,
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS orphan_rows
UNION ALL
SELECT 'lineitem->orders',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'lineitem->part',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p
                          WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'lineitem->supplier',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM supplier s
                          WHERE s.s_suppkey = l.l_suppkey))
UNION ALL
SELECT 'customer->nation',
       (SELECT count(*) FROM customer),
       (SELECT count(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = c.c_nationkey))
UNION ALL
SELECT 'supplier->nation',
       (SELECT count(*) FROM supplier),
       (SELECT count(*) FROM supplier s
        WHERE NOT EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = s.s_nationkey))
UNION ALL
SELECT 'nation->region',
       (SELECT count(*) FROM nation),
       (SELECT count(*) FROM nation n
        WHERE NOT EXISTS (SELECT 1 FROM region r
                          WHERE r.r_regionkey = n.n_regionkey))
"""


# ------------------------------ interpolated percentiles (exact)


def order_price_percentiles_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_cont semantics (linear interpolation between
    bracketing order statistics) at p = 25/50/75/90 per order priority,
    in an EXACT formulation: for target rank t = (n−1)·p/100, the result
    is v_lo + (v_hi − v_lo)·frac where lo = floor(t)+1, hi = lo+1 (1-based),
    and frac = the fractional part of t — a rational with denominator
    100. Computing 100·percentile = (100−r)·v_lo + r·v_hi with integer
    r = (n−1)·p mod 100 keeps everything in exact DECIMAL; the surfaced
    value divides by 100 in doubles and rounds to 6. Built-in
    percentile_cont/approx variants interpolate in floats (sum-order
    dependent); this formulation is the oracle-checkable tier.

    Plan/scale: one rank window per priority group + a 4-way explode of
    the percentile targets; the per-group rank is the honest exact-tier
    cost (the sketch tier replaces it at 100 TB, same as the MAD query).
    """
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("v", "o_orderkey")
    cnt = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cnt).alias("n"),
    )
    ps = F.explode(F.array(*[F.lit(p) for p in (25, 50, 75, 90)])).alias("p")
    targets = ranked.select("o_orderpriority", "v", "rn", "n", ps)
    t100 = (F.col("n") - 1) * F.col("p")  # 100·t, integer
    lo = F.floor(t100 / 100) + 1
    r = t100 % 100
    # weights are 0..100 — cast to DECIMAL(3,0) so the product stays
    # inside precision 38 (a raw BIGINT operand promotes to (20,0) and
    # the product would silently truncate at (38,2))
    contrib = (
        F.when(F.col("rn") == lo, F.col("v") * (100 - r).cast("decimal(3,0)"))
        .when(
            (F.col("rn") == lo + 1) & (r > 0),
            F.col("v") * r.cast("decimal(3,0)"),
        )
        .otherwise(F.lit(0))
    )
    return (
        targets.groupBy("o_orderpriority", "p")
        .agg(F.sum(contrib).alias("h100"))
        .select(
            "o_orderpriority",
            "p",
            F.round(F.col("h100").cast("double") / 100, 6).alias("percentile"),
        )
    )


PERCENTILES_CONT_ORACLE = """
WITH ranked AS (
  SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2)) AS v,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY CAST(o_totalprice AS DECIMAL(18,2)),
                                     o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
), targets AS (
  SELECT o_orderpriority, v, rn, n, CAST(p AS BIGINT) AS p
  FROM ranked, unnest([25, 50, 75, 90]) t(p)
), contrib AS (
  SELECT o_orderpriority, p,
         CASE WHEN rn = (n - 1) * p // 100 + 1
                   THEN v * CAST(100 - (n - 1) * p % 100 AS DECIMAL(3,0))
              WHEN rn = (n - 1) * p // 100 + 2 AND (n - 1) * p % 100 > 0
                   THEN v * CAST((n - 1) * p % 100 AS DECIMAL(3,0))
              ELSE 0 END AS c
  FROM targets
)
SELECT o_orderpriority, p,
       round(CAST(sum(c) AS DOUBLE) / 100, 6) AS percentile
FROM contrib GROUP BY o_orderpriority, p
"""


# ----------------------------------------------- keyset pagination


def orders_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 4 (rows 61-80) of the orders feed ordered by
    (o_totalprice DESC, o_orderkey ASC), fetched with KEYSET (seek)
    pagination: the page-3 boundary tuple is found first, then the page
    is WHERE (price, key) seek-after boundary ORDER BY … LIMIT 20. The
    API-backend access pattern: OFFSET pagination pulls the entire
    prefix through the sort on every page; the seek predicate lets the
    engine prune everything before the boundary (and at 100 TB, with the
    feed sorted/z-ordered on the key, prune whole FILES at the scan).

    Determinism: the sort key (price, orderkey) is total; the boundary
    tuple is unique, so the page content is engine-stable. Both the
    boundary probe and the page are TakeOrderedAndProject (top-k), never
    a global sort.
    """
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        "o_orderpriority",
    )
    # boundary = last tuple of page 3 (row 60): top-60 then min by order
    page3 = o.orderBy(F.desc("price"), F.asc("o_orderkey")).limit(60)
    boundary = page3.orderBy(F.asc("price"), F.desc("o_orderkey")).limit(1).select(
        F.col("price").alias("b_price"), F.col("o_orderkey").alias("b_key")
    )
    page4 = (
        o.crossJoin(F.broadcast(boundary))
        .where(
            (F.col("price") < F.col("b_price"))
            | ((F.col("price") == F.col("b_price")) & (F.col("o_orderkey") > F.col("b_key")))
        )
        .orderBy(F.desc("price"), F.asc("o_orderkey"))
        .limit(20)
    )
    return page4.select(
        "o_orderkey", F.col("price").cast("double").alias("totalprice"), "o_orderpriority"
    )


KEYSET_PAGINATION_ORACLE = """
WITH o AS (
  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         o_orderpriority
  FROM orders
), b AS (
  SELECT price AS b_price, o_orderkey AS b_key
  FROM o ORDER BY price DESC, o_orderkey ASC
  LIMIT 1 OFFSET 59
)
SELECT o.o_orderkey, CAST(o.price AS DOUBLE) AS totalprice, o.o_orderpriority
FROM o CROSS JOIN b
WHERE o.price < b.b_price
   OR (o.price = b.b_price AND o.o_orderkey > b.b_key)
ORDER BY o.price DESC, o.o_orderkey ASC
LIMIT 20
"""
