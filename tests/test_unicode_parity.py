"""Unicode-corpus cross-engine parity representatives.

The full sweep (``tools/robustness_sweeps.py unicode`` — every oracled
spec value-compared against DuckDB on a corpus whose document text is
interleaved with emoji/CJK/RTL/combining-mark snippets) ran 232/232
green in round 5. This pins the text-pipeline representatives in the
default pytest run so a tokenizer/normalizer/hash edit can't silently
regress non-ASCII parity: the hazard classes are byte-vs-codepoint
length, locale-dependent casing, md5-over-encoded-text, and shingle
windows straddling multi-byte boundaries.

The corpus recipe is imported from the sweep tool (single source of
truth), applied to sf0.001 for test-time budget.
"""

from __future__ import annotations

import glob
import importlib.util
import os
import pathlib
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nbi_oedi_etl_spark import workload

from .conftest import assert_oracle_match

_TOOL = pathlib.Path(__file__).resolve().parent.parent / "tools" / "robustness_sweeps.py"
_spec = importlib.util.spec_from_file_location("robustness_sweeps", _TOOL)
_sweeps = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_sweeps)

_REPRESENTATIVES = [
    "doc_token_stats",        # whitespace tokenization + length stats
    "doc_lang_guess",         # n-gram heuristic over raw codepoints
    "doc_fingerprints",       # rolling hash over encoded text
    "minhash_lsh_portable",   # md5 shingle hashing, band join
    "winnowing_fingerprints", # k-gram windows straddling multi-byte chars
    "doc_token_entropy",      # per-token distribution on mixed scripts
]


@pytest.fixture(scope="module")
def unicode_sf_dir() -> str:
    src = "/root/testdata/sf0.001"
    d = tempfile.mkdtemp(prefix="unicode_sf_")
    snippets = _sweeps.UNICODE_SNIPPETS
    for p in glob.glob(src + "/*.parquet"):
        t = pq.read_table(p)
        name = os.path.basename(p)
        if name == "documents.parquet":
            ids = t.column("doc_id").to_pylist()
            texts = t.column("text").to_pylist()
            new = []
            for di, tx in zip(ids, texts):
                words = (tx or "").split()[:10]
                mix = " ".join(
                    w + " " + snippets[(di + j) % len(snippets)]
                    for j, w in enumerate(words)
                )
                new.append(mix.strip() or snippets[di % len(snippets)].strip())
            t = t.set_column(
                t.schema.get_field_index("text"),
                t.schema.field("text"),
                pa.array(new, type=t.schema.field("text").type),
            )
        pq.write_table(t, os.path.join(d, name))
    return d


@pytest.fixture(scope="module")
def unicode_oracle_con(unicode_sf_dir):
    con = duckdb.connect()
    for p in glob.glob(unicode_sf_dir + "/*.parquet"):
        t = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("name", _REPRESENTATIVES)
def test_unicode_corpus_matches_oracle(spark, unicode_sf_dir, unicode_oracle_con, name):
    spec = {s.name: s for s in workload.SPECS}[name]
    assert_oracle_match(spec.fn(spark, unicode_sf_dir), unicode_oracle_con, spec.oracle)
