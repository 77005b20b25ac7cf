"""Empirical scale probe: run the heaviest headline queries at sf0.1 and
at a synthetic 10x replica of it, and measure how wall-clock actually
scales — the measured (not argued) half of SCALE.md.

The 10x corpus is NOT ten concatenated copies: every table's keys are
offset per replica so join fan-outs, group cardinalities, and dedup
structure replicate the way real growth does —

- fact keys (orderkey / custkey / partkey / suppkey / user_id / doc_id /
  vec_id) shift by replica * OFFSET, and the dimension tables that own
  those keys replicate with the same shift, so referential integrity and
  join selectivity are preserved;
- region/nation stay fixed (bounded dims stay bounded at 100 TB too);
- document text gets a per-replica CAESAR SHIFT of every non-stopword
  word's letters (one prefix token is not enough: 97% of shingles would
  survive, minhash signatures would collide across replicas, and
  near-dup clusters would fuse into one 10x-dense clique — measuring
  the corpus's pathology, not the engine's scaling). A same-length
  letters-to-letters bijection per replica preserves intra-replica
  Jaccard exactly while collapsing it across replicas, so clusters
  replicate as disjoint copies — AND, unlike the r6 symbol-suffix tag,
  preserves every Gopher quality feature (word count, mean word length,
  symbol ratio, stopword presence: stopwords pass through verbatim), so
  quality-gated pipelines see 10x data at every stage, not just the
  scan (the r6 tag made replicas 1..9 fail symbols_ok/has_stopword and
  corpus_prep_pipeline's dedup+chunk stages silently ran at 1x);
- embeddings get a deterministic per-replica PERMUTATION of coordinates:
  a permutation preserves norms and intra-replica cosines exactly and
  decorrelates replicas — same reasoning for cosine-similarity cells.

A query scaling linearly should show ratio ~= 10 on compute-bound work,
and LESS on anything with per-job fixed overhead (tiny iterative rounds,
streaming micro-batches). Ratios well above 10 flag super-linear shapes
(the round-2 fuzzy-pair blow-up would have shown ~100x here).

Usage:
    python tools/scale_probe.py [--top N] [--factor K] [--json OUT]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SCALE_PROBE_SRC", "/root/testdata/sf0.1")

# per-replica key offsets, all far above the sf0.1 key ranges
_KEY_OFFSETS = {
    "l_orderkey": 100_000_000,
    "o_orderkey": 100_000_000,
    "l_partkey": 10_000_000,
    "p_partkey": 10_000_000,
    "l_suppkey": 1_000_000,
    "s_suppkey": 1_000_000,
    "o_custkey": 10_000_000,
    "c_custkey": 10_000_000,
    "user_id": 10_000_000,
    "doc_id": 10_000_000,
    "vec_id": 10_000_000,
    "event_id": 100_000_000,
}
_FIXED_TABLES = {"region.parquet", "nation.parquet"}


def _replicate(t: pa.Table, name: str, rep: int) -> pa.Table:
    if rep == 0:
        return t
    for col in t.column_names:
        off = _KEY_OFFSETS.get(col)
        if off is not None:
            i = t.schema.get_field_index(col)
            typ = t.schema.field(col).type
            shifted = pc.add(t.column(col), pa.scalar(rep * off, type=typ))
            t = t.set_column(i, t.schema.field(col), shifted.cast(typ))
    if name == "documents.parquet":
        import string

        from nbi_oedi_etl_spark.operators.text import LANG_STOPWORDS

        stop = set(LANG_STOPWORDS["en"])
        k = rep % 25 + 1  # never the identity shift

        def shift(w: str) -> str:
            if w.strip(string.punctuation).lower() in stop:
                return w  # preserve has_stopword verbatim
            return "".join(
                chr((ord(c) - 97 + k) % 26 + 97)
                if "a" <= c <= "z"
                else chr((ord(c) - 65 + k) % 26 + 65)
                if "A" <= c <= "Z"
                else c
                for c in w
            )

        i = t.schema.get_field_index("text")
        texts = [
            None if tx is None else " ".join(shift(w) for w in tx.split())
            for tx in t.column("text").to_pylist()
        ]
        t = t.set_column(
            i, t.schema.field("text"),
            pa.array(texts, type=t.schema.field("text").type),
        )
    if name == "embeddings.parquet":
        import numpy as np

        i = t.schema.get_field_index("embedding")
        col = t.column("embedding").combine_chunks()
        typ = t.schema.field("embedding").type
        raw = col.to_pylist()
        dim = next((len(v) for v in raw if v is not None), 0)
        perm = np.random.RandomState(rep).permutation(dim)
        vecs = [None if v is None else [float(v[j]) for j in perm] for v in raw]
        t = t.set_column(i, t.schema.field("embedding"), pa.array(vecs, type=typ))
    return t


def build_corpus(factor: int) -> str:
    # v2: caesar-shift document replication (gopher-feature-preserving)
    d = os.path.join(tempfile.gettempdir(), f"scale_probe_{factor}x_v2")
    marker = os.path.join(d, ".complete")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    for p in sorted(glob.glob(SRC + "/*.parquet")):
        name = os.path.basename(p)
        base = pq.read_table(p)
        if name in _FIXED_TABLES:
            pq.write_table(base, os.path.join(d, name))
            continue
        reps = [_replicate(base, name, r) for r in range(factor)]
        pq.write_table(pa.concat_tables(reps), os.path.join(d, name))
    with open(marker, "w") as f:
        f.write("ok")
    return d


def heaviest_queries(top: int) -> list[str]:
    detail = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "BENCH_DETAIL.json")
    with open(detail) as f:
        qs = json.load(f)["queries"]
    return [n for n, _ in sorted(qs.items(), key=lambda kv: -kv[1])[:top]]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--json", default="SCALE_PROBE.json")
    ap.add_argument("--queries", nargs="*", help="explicit query names (overrides --top)")
    ap.add_argument(
        "--merge",
        action="store_true",
        help="merge results into an existing --json file (same factor/src) "
        "instead of overwriting it — used to extend the probed set",
    )
    args = ap.parse_args()

    from nbi_oedi_etl_spark import get_spark, workload

    names = args.queries or heaviest_queries(args.top)
    big = build_corpus(args.factor)
    spark = get_spark(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = workload.queries()
    # warm the session so JVM startup doesn't land on the first query
    qs["pricing_summary"](spark, SRC).collect()

    results: dict[str, dict] = {}
    for n in names:
        fn = qs[n]
        t0 = time.perf_counter()
        rows_small = len(fn(spark, SRC).collect())
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        rows_big = len(fn(spark, big).collect())
        t_big = time.perf_counter() - t0
        ratio = t_big / t_small if t_small > 0 else float("inf")
        results[n] = {
            "t_1x_sec": round(t_small, 3),
            f"t_{args.factor}x_sec": round(t_big, 3),
            "ratio": round(ratio, 2),
            "rows_1x": rows_small,
            f"rows_{args.factor}x": rows_big,
            "superlinear": bool(ratio > 1.5 * args.factor),
        }
        print(f"{n}: 1x={t_small:.2f}s {args.factor}x={t_big:.2f}s "
              f"ratio={ratio:.1f} rows {rows_small}->{rows_big}"
              + ("  ** SUPERLINEAR **" if results[n]["superlinear"] else ""))

    if args.merge and os.path.exists(args.json):
        with open(args.json) as f:
            prev = json.load(f)
        if prev.get("factor") == args.factor and prev.get("source_sf_dir") == SRC:
            results = {**prev.get("queries", {}), **results}
    out = {
        "factor": args.factor,
        "source_sf_dir": SRC,
        "queries": results,
        "flagged": [n for n, r in results.items() if r["superlinear"]],
    }
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {args.json}; flagged: {out['flagged']}")
    return 1 if out["flagged"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
