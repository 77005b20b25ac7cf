"""Round-4 extension queries, wave 9: distribution-drift monitoring,
content-addressable table auditing, behavioral sequence mining, and
graph-partition quality.

- ``event_value_psi_drift`` — Population Stability Index of the event
  value distribution between two ingest epochs: THE production drift
  metric (scorecard monitoring, feature drift) — numeric-bucket
  complement of the categorical KL audit (source_lang_kl_drift).
- ``table_content_digest`` — order-free content digest per partition
  group (bit_xor of portable row hashes): the exactly-once audit
  primitive — two engines (or two runs) produce identical digests iff
  the row sets are identical, without sorting or moving the data.
- ``session_event_trigrams`` — event-type trigram counts within
  30-minute sessions: behavioral path mining (the what-do-users-do
  sequence patterns), composing sessionization + in-session n-grams.
- ``near_dup_source_modularity`` — Newman modularity of the SOURCE
  partition over the near-dup candidate graph: do duplicates
  concentrate within sources (benign re-crawls) or bridge them
  (contamination)? Exact integer formulation — modularity is rational
  in edge counts.

Oracle convention identical to workload.py; float determinism per the
established recipe (ln terms rounded once into DECIMAL, exact integer
interiors, doubles only in final rounded columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nbi_oedi_etl_spark.sources.parquet import read_table

# ------------------------------------------------- PSI drift monitor


def event_value_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first-half epoch (days
    1-15) and the rest of the events table, over 10 equal-width value
    buckets: PSI = Σ_b (p_b − q_b)·ln(p_b/q_b). The standard model/
    feature drift gate (PSI < 0.1 stable, > 0.25 action).

    Exactness: the probability difference is a RATIONAL — the term is
    computed as (cA·nB − cB·nA)·(ln9 cA − ln9 nA − ln9 cB + ln9 nB) in
    exact BIGINT × DECIMAL arithmetic and divided by nA·nB only in the
    final double. Buckets empty on either side are excluded (ln 0 —
    standard practice is smoothing or exclusion; exclusion is the
    deterministic choice) and reported via the n_buckets_used column.

    Plan/scale: one grouped count per (epoch, bucket) — a 2×10-row
    result off a single corpus aggregate; everything downstream is
    constant-sized. The drift gate costs one scan at any scale.
    """
    ev = read_table(spark, sf_dir, "events").select(
        (F.datediff(F.col("ts"), F.lit("1970-01-01")) <= F.lit(19737)).alias(
            "epoch_a"
        ),  # 2024-01-15
        F.least(
            F.greatest(F.floor(F.col("value") / 10).cast("int"), F.lit(0)),
            F.lit(9),
        ).alias("bucket"),
    )
    counts = ev.groupBy("bucket").agg(
        F.sum(F.when(F.col("epoch_a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("epoch_a"), 0).otherwise(1)).alias("cb"),
    )
    tot = counts.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )

    def ln9(col):
        return F.round(F.log(col.cast("double")), 9).cast("decimal(18,9)")

    used = counts.where((F.col("ca") > 0) & (F.col("cb") > 0)).crossJoin(
        F.broadcast(tot)
    )
    terms = used.select(
        "na",
        "nb",
        (
            (F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")).cast(
                "decimal(20,0)"
            )
            * (ln9(F.col("ca")) - ln9(F.col("na")) - ln9(F.col("cb")) + ln9(F.col("nb")))
        ).alias("term"),
    )
    return terms.groupBy("na", "nb").agg(
        F.count(F.lit(1)).alias("n_buckets_used"),
        F.round(
            F.sum("term").cast("double")
            / (F.col("na").cast("double") * F.col("nb").cast("double")),
            6,
        ).alias("psi"),
    ).select(
        F.col("na").alias("n_epoch_a"),
        F.col("nb").alias("n_epoch_b"),
        "n_buckets_used",
        "psi",
    )


PSI_DRIFT_ORACLE = """
WITH ev AS (
  SELECT date_diff('day', DATE '1970-01-01', ts) <= 19737 AS epoch_a,
         least(greatest(CAST(floor(value / 10) AS INTEGER), 0), 9) AS bucket
  FROM events
), counts AS (
  SELECT bucket,
         CAST(sum(CASE WHEN epoch_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN epoch_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
  FROM ev GROUP BY bucket
), tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
  FROM counts
), terms AS (
  SELECT t.na, t.nb,
         CAST(c.ca * t.nb - c.cb * t.na AS DECIMAL(20,0))
         * (CAST(round(ln(CAST(c.ca AS DOUBLE)), 9) AS DECIMAL(18,9))
            - CAST(round(ln(CAST(t.na AS DOUBLE)), 9) AS DECIMAL(18,9))
            - CAST(round(ln(CAST(c.cb AS DOUBLE)), 9) AS DECIMAL(18,9))
            + CAST(round(ln(CAST(t.nb AS DOUBLE)), 9) AS DECIMAL(18,9))) AS term
  FROM counts c CROSS JOIN tot t
  WHERE c.ca > 0 AND c.cb > 0
)
SELECT na AS n_epoch_a, nb AS n_epoch_b,
       count(*) AS n_buckets_used,
       round(CAST(sum(term) AS DOUBLE)
             / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS psi
FROM terms GROUP BY na, nb
"""


# -------------------------------------------- content digest auditing


def table_content_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-free content digest of the orders table per order status:
    bit_xor of portable 60-bit row hashes, plus row count and an exact
    total. Two engines / two runs / two partitionings produce identical
    digests iff the row SETS are identical — the cheap exactly-once /
    replication audit that needs no sort and no data movement beyond one
    aggregate (the reconciliation primitive next to the anti-join check,
    reference monitor.py:87-136 semantics).

    XOR caveat (documented): duplicate PAIRS cancel — the count column
    guards cardinality alongside. Map-only hash + one grouped aggregate;
    at 100 TB the digest is a per-partition partial XOR that merges
    associatively — the textbook distributive aggregate.
    """
    o = read_table(spark, sf_dir, "orders")
    row_repr = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.col("o_orderpriority"),
    )
    h = F.conv(F.substring(F.md5(row_repr), 1, 15), 16, 10).cast("bigint")
    return (
        o.select(F.col("o_orderstatus").alias("orderstatus"), h.alias("h"))
        .groupBy("orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(h)").alias("content_digest"),
            F.min("h").alias("min_hash"),
            F.max("h").alias("max_hash"),
        )
    )


CONTENT_DIGEST_ORACLE = """
WITH h AS (
  SELECT o_orderstatus AS orderstatus,
         ('0x' || substring(md5(
             CAST(o_orderkey AS VARCHAR) || '|' ||
             CAST(o_custkey AS VARCHAR) || '|' ||
             o_orderstatus || '|' ||
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
             strftime(o_orderdate, '%Y-%m-%d') || '|' ||
             o_orderpriority), 1, 15))::BIGINT AS h
  FROM orders
)
SELECT orderstatus, count(*) AS n_rows,
       bit_xor(h) AS content_digest,
       min(h) AS min_hash, max(h) AS max_hash
FROM h GROUP BY orderstatus
"""


# --------------------------------------- session trigram path mining


def session_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type trigram counts WITHIN 30-minute user sessions —
    behavioral path mining (which 3-step flows actually happen), the
    composition of gap sessionization and in-sequence n-grams. Patterns
    crossing a session boundary must NOT count: the trigram window
    partitions by (user, session), not by user.

    Determinism: the in-session order is (ts, event_id) — total; counts
    are exact ints. Plan/scale: ONE user-keyed exchange serves the gap
    lag, the session cumsum, the trigram leads, and feeds the final
    (a, b, c) count — the full mining pass costs one corpus shuffle plus
    a vocabulary³-bounded aggregate.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(
            F.lag("ts", 1).over(wu).isNull()
            | (
                F.col("ts")
                >= F.lag("ts", 1).over(wu) + F.expr("INTERVAL 30 MINUTES")
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = marked.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.sum("new_s").over(
            wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("sid"),
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    tri = sess.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(ws).alias("e2"),
        F.lead("event_type", 2).over(ws).alias("e3"),
        "user_id",
        "sid",
    ).where(F.col("e3").isNotNull())
    return (
        tri.groupBy("e1", "e2", "e3")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("user_id", "sid").alias("n_sessions"),
        )
        
    )


SESSION_TRIGRAMS_ORACLE = """
WITH marked AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
                OR ts >= lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id)
                         + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
), sess AS (
  SELECT user_id, event_id, ts, event_type,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
), tri AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3,
         user_id, sid
  FROM sess
  WINDOW w AS (PARTITION BY user_id, sid ORDER BY ts, event_id)
)
SELECT e1, e2, e3, count(*) AS n_occurrences,
       count(DISTINCT (user_id, sid)) AS n_sessions
FROM tri WHERE e3 IS NOT NULL
GROUP BY e1, e2, e3
"""


# ------------------------------------ source-partition modularity


def near_dup_source_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the SOURCE partition over the near-dup
    candidate graph: Q = Σ_s (e_ss/m − (d_s/2m)²). High Q → duplicates
    concentrate within sources (benign re-crawls); low/negative Q →
    duplication bridges sources (cross-source contamination — the case
    that matters for eval decontamination). The graph-partition-quality
    audit over the SAME candidate pairs the dedup pipeline already
    computes (shared memoized stage).

    Exactness: modularity is RATIONAL in edge counts — each source
    contribution surfaces as round((4m·e_ss − d_s²)/(4m²), 6) computed
    from exact BIGINTs; no floats anywhere in the interior.

    Plan/scale: the candidate-pair table (bounded by LSH banding) joins
    the |docs|-row source map twice (broadcast); everything else is
    source-cardinality-sized.
    """
    from nbi_oedi_etl_spark.workload_ext import (
        _portable_minhash_pairs,
        portable_signatures_cached,
    )

    docs = read_table(spark, sf_dir, "documents")
    src = docs.select("doc_id", "source")
    pairs = _portable_minhash_pairs(
        docs, sig=portable_signatures_cached(spark, sf_dir)
    )
    e = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_id_a"), F.col("source").alias("sa")),
            "doc_id_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_id_b"), F.col("source").alias("sb")),
            "doc_id_b",
        )
    )
    m_df = e.agg(F.count(F.lit(1)).alias("m"))
    within = (
        e.where(F.col("sa") == F.col("sb"))
        .groupBy(F.col("sa").alias("source"))
        .agg(F.count(F.lit(1)).alias("e_ss"))
    )
    deg = (
        e.select(F.col("sa").alias("source"))
        .union(e.select(F.col("sb").alias("source")))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("d_s"))
    )
    out = (
        deg.join(within, "source", "left")
        .crossJoin(F.broadcast(m_df))
        .select(
            "source",
            F.coalesce("e_ss", F.lit(0)).alias("e_within"),
            "d_s",
            F.round(
                (
                    F.lit(4) * F.col("m") * F.coalesce("e_ss", F.lit(0))
                    - F.col("d_s") * F.col("d_s")
                ).cast("double")
                / (F.lit(4.0) * F.col("m").cast("double") * F.col("m").cast("double")),
                6,
            ).alias("modularity_contribution"),
        )
    )
    return out


SOURCE_MODULARITY_ORACLE = r"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(len(toks) - 2),
             i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS s
  FROM d
), hs AS (
  SELECT doc_id, seed,
         min(('0x' || substring(md5(seed::VARCHAR || '|' || s), 1, 15))::BIGINT) AS m
  FROM sh, range(8) t(seed) GROUP BY doc_id, seed
), sig AS (
  SELECT doc_id, list(m ORDER BY seed) AS sig FROM hs GROUP BY doc_id
), bnd AS (
  SELECT doc_id, band, sig[2*band+1] AS v1, sig[2*band+2] AS v2
  FROM sig, range(4) t(band)
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b2.doc_id AS doc_id_b
  FROM bnd a JOIN bnd b2 ON a.band = b2.band AND a.v1 = b2.v1 AND a.v2 = b2.v2
                         AND a.doc_id < b2.doc_id
), e AS (
  SELECT p.doc_id_a, p.doc_id_b, da.source AS sa, db.source AS sb
  FROM pairs p
  JOIN documents da ON da.doc_id = p.doc_id_a
  JOIN documents db ON db.doc_id = p.doc_id_b
), m_t AS (
  SELECT count(*) AS m FROM e
), within AS (
  SELECT sa AS source, count(*) AS e_ss FROM e WHERE sa = sb GROUP BY sa
), deg AS (
  SELECT source, count(*) AS d_s
  FROM (SELECT sa AS source FROM e UNION ALL SELECT sb AS source FROM e)
  GROUP BY source
)
SELECT deg.source,
       CAST(coalesce(within.e_ss, 0) AS BIGINT) AS e_within,
       CAST(deg.d_s AS BIGINT) AS d_s,
       round(CAST(4 * m_t.m * coalesce(within.e_ss, 0)
                  - deg.d_s * deg.d_s AS DOUBLE)
             / (4.0 * CAST(m_t.m AS DOUBLE) * CAST(m_t.m AS DOUBLE)),
             6) AS modularity_contribution
FROM deg
LEFT JOIN within USING (source)
CROSS JOIN m_t
"""
