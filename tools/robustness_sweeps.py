"""Registry-wide robustness sweeps over degenerate / adversarial corpora.

Each sweep rebuilds the testdata fixtures into a temp dir with one
degenerate shape and drives EVERY registered query over it; the
``unicode`` sweep additionally value-compares every oracled query against
its DuckDB twin on the same rebuilt corpus (full cross-engine parity on
non-ASCII text). These found 7 real bugs in round 5 (divide-by-zero
statistics, bytes(None) worker crashes, a recursion-row-limit abort, a
0-row heartbeat template) — the per-shape regression pins live in
tests/test_empty_input.py; this script is the full-registry version.

Usage:
    python tools/robustness_sweeps.py empty|one_row|clique|nulls|unicode|all
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SMALL = "/root/testdata/sf0.001"
SRC_PARITY = "/root/testdata/sf0.01"

UNICODE_SNIPPETS = [
    "café naïve résumé déjà-vu ", "日本語のテキスト処理 ", "emoji 🚀🔥🧪 mixed ",
    "Ωμέγα ελληνικά λόγια ", "числа и слова по-русски ", "é combining acute ",
    "ZERO​WIDTH joined ", "ligature ﬁre ﬂow ", "한국어 형태소 분석 ",
    "العربية نص تجريبي ",
]


def _build(shape: str) -> str:
    src = SRC_PARITY if shape == "unicode" else SRC_SMALL
    d = tempfile.mkdtemp(prefix=f"sweep_{shape}_")
    for p in glob.glob(src + "/*.parquet"):
        t = pq.read_table(p)
        name = os.path.basename(p)
        if shape == "empty":
            t = t.slice(0, 0)
        elif shape == "one_row":
            t = t.slice(0, 1)
        elif shape == "clique":
            if name == "documents.parquet":
                t = _const_col(t, "text", t.column("text")[0].as_py())
            elif name == "embeddings.parquet":
                t = _const_col(t, "embedding", t.column("embedding")[0].as_py())
            elif name == "events.parquet":
                t = _const_col(t, "user_id", t.column("user_id")[0].as_py())
                t = _const_col(t, "ts", t.column("ts")[0].as_py())
        elif shape == "nulls":
            for c in {"documents.parquet": ["text"], "events.parquet": ["value", "props"]}.get(name, []):
                i = t.schema.get_field_index(c)
                t = t.set_column(i, t.schema.field(c), pa.nulls(len(t), type=t.schema.field(c).type))
        elif shape == "unicode":
            if name == "documents.parquet":
                ids = t.column("doc_id").to_pylist()
                texts = t.column("text").to_pylist()
                new = []
                for di, tx in zip(ids, texts):
                    words = (tx or "").split()[:10]
                    mix = " ".join(
                        w + " " + UNICODE_SNIPPETS[(di + j) % len(UNICODE_SNIPPETS)]
                        for j, w in enumerate(words)
                    )
                    new.append(mix.strip() or UNICODE_SNIPPETS[di % len(UNICODE_SNIPPETS)].strip())
                t = t.set_column(
                    t.schema.get_field_index("text"), t.schema.field("text"),
                    pa.array(new, type=t.schema.field("text").type),
                )
        pq.write_table(t, os.path.join(d, name))
    return d


def _const_col(t: pa.Table, col: str, value) -> pa.Table:
    i = t.schema.get_field_index(col)
    return t.set_column(i, t.schema.field(col), pa.array([value] * len(t), type=t.schema.field(col).type))


def run(shape: str) -> int:
    from pyspark.sql import SparkSession

    from nbi_oedi_etl_spark import workload

    d = _build(shape)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    qs = workload.queries()
    fails: list[tuple[str, str]] = []
    if shape == "unicode":
        import duckdb

        con = duckdb.connect()
        for f in glob.glob(d + "/*.parquet"):
            con.sql(f"CREATE VIEW {os.path.basename(f).replace('.parquet', '')} AS SELECT * FROM '{f}'")
        oracles = workload.oracle_sql()
        for n, sql in oracles.items():
            try:
                got = qs[n](spark, d).toPandas()
                want = con.sql(sql).df()
                got = got.reindex(sorted(got.columns), axis=1).sort_values(by=sorted(got.columns)).reset_index(drop=True)
                want = want.reindex(sorted(want.columns), axis=1).sort_values(by=sorted(want.columns)).reset_index(drop=True)
                if list(got.columns) != list(want.columns):
                    fails.append((n, "cols"))
                    continue
                if len(got) != len(want):
                    fails.append((n, f"rows {len(got)} vs {len(want)}"))
                    continue
                for c in got.columns:
                    g, w = got[c], want[c]
                    if not ((g == w) | (g.isna() & w.isna())).all():
                        fails.append((n, f"col {c}"))
                        break
            except Exception as e:  # noqa: BLE001 — sweep reports, doesn't mask
                fails.append((n, repr(e)[:140]))
        print(f"[{shape}] parity-checked {len(oracles)} oracled specs; fails: {fails}")
    else:
        for n in qs:
            try:
                rows = qs[n](spark, d).collect()
                assert isinstance(rows, list)
            except Exception as e:  # noqa: BLE001
                fails.append((n, repr(e)[:140]))
        print(f"[{shape}] ran {len(qs)} queries; fails: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    shapes = sys.argv[1:] or ["all"]
    if shapes == ["all"]:
        shapes = ["empty", "one_row", "clique", "nulls", "unicode"]
    sys.exit(max(run(s) for s in shapes))
