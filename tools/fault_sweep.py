"""Fault-injection sweep (round-8 headline, VERDICT r7 task 1).

The reference's one operational feature is log-and-drop with a discrepancy
report: a file that fails transformation is dropped and surfaced, never
silently half-processed (reference etl/oedi_etl/monitor.py:87-136,
transform.py:168-170, the 5790-1.parquet example in README.md:337-361).
This sweep proves the Spark engine honors the same contract under injected
faults, and that the pure-Python codec tier quarantines adversarial
payloads with bounded work.

Part A — corrupt parquet inputs, full registry:
  1. Build a faulted replica of the source sf dir: each ``<t>.parquet``
     becomes a DIRECTORY holding the pristine bytes as ``part-00000`` plus
     three planted corruptions — ``truncated`` (first 60% of the bytes,
     footer gone), ``badfooter`` (tail magic PAR1 -> JUNK), and
     ``bitflip-footer`` (the 8 bytes of footer-length/metadata before the
     magic forced to 0xFF).
  2. LOUD-FAIL: a default Spark scan of every faulted table must raise —
     never return rows silently missing or wrong (the anti-silent-loss
     half of the contract).
  3. QUARANTINE: ``sources.quarantine.read_with_quarantine`` over the part
     files must drop EXACTLY the three planted files, keep every pristine
     row, and report them (the drop-and-report half). On pristine inputs it
     must quarantine nothing (no false positives).
  4. FILE-LEVEL CLEAN + FULL REGISTRY: copy the quarantine-approved files
     into a cleaned replica and run every registered query against it; each
     result must match the same query on the pristine dir row-for-row
     (queries are written bit-exact, so exact compare).
  5. BITFLIP-MID PROBE (documented, not asserted): one mid-file byte
     XOR 0xFF with the footer intact — parquet pages carry CRCs that
     pyarrow writes; record whether Spark detects (loud) or the flip lands
     in dead bytes. Detection here is format-dependent, so the sweep
     RECORDS the observed behavior per table instead of asserting it.
  6. TRUST-BOUNDARY INGEST (asserted): ``ingest_untrusted`` re-encodes the
     faulted replica through the CRC-checksummed engine sink — quarantine
     set exact, rows reconciled, and a mid-file flip on the RE-ENCODED
     copy must fail loudly or land in dead bytes, never silently alter
     values (closing the step-5 residue for data the engine re-owns).

Part B — adversarial payloads through all 5 codecs (PNG, BMP, JPEG, WebP,
WAV): empty / magic-only / truncations of a real payload at every 7th byte
/ oversized-dimension headers / cyclic-prefix bodies / seeded random bytes.
Every decode must raise ValueError (or the documented NotImplementedError
for lossy VP8) within a wall-clock budget — never MemoryError, never a
hang, never a wrong-type crash — and the query-level surface
(``extract_image_features`` / ``extract_wav_features``) must map each to
``decoded_ok=False`` rows, not a job failure.

Writes FAULT_SWEEP.json at the repo root. Representative cases are pinned
in tests/test_fault_sweep.py; this script is the exhaustive re-runnable
form. Run: ``python tools/fault_sweep.py [--quick]``.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import pathlib
import shutil
import sys
import time

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

SRC_SF = "/root/testdata/sf0.01"
TIME_BUDGET_S = 5.0  # per adversarial decode

_PLANTED = ("corrupt-truncated.parquet", "corrupt-badfooter.parquet",
            "corrupt-bitflip-footer.parquet")


# ------------------------------------------------------------ replicas
def _tables() -> tuple[str, ...]:
    from nbi_oedi_etl_spark.sources.parquet import TABLES

    return TABLES


def _corruptions(data: bytes) -> dict[str, bytes]:
    return {
        "corrupt-truncated.parquet": data[: int(len(data) * 0.6)],
        "corrupt-badfooter.parquet": data[:-4] + b"JUNK",
        "corrupt-bitflip-footer.parquet": data[:-12] + b"\xff" * 8 + data[-4:],
    }


def build_faulted_replica(src: str, dst: pathlib.Path) -> None:
    from nbi_oedi_etl_spark.sources.parquet import TABLES

    for t in TABLES:
        data = (pathlib.Path(src) / f"{t}.parquet").read_bytes()
        d = dst / f"{t}.parquet"
        d.mkdir(parents=True)
        (d / "part-00000.parquet").write_bytes(data)
        for name, blob in _corruptions(data).items():
            (d / name).write_bytes(blob)


def build_bitflip_mid_replica(src: str, dst: pathlib.Path) -> None:
    from nbi_oedi_etl_spark.sources.parquet import TABLES

    for t in TABLES:
        data = bytearray((pathlib.Path(src) / f"{t}.parquet").read_bytes())
        data[len(data) // 2] ^= 0xFF
        d = dst / f"{t}.parquet"
        d.mkdir(parents=True)
        (d / "part-00000.parquet").write_bytes(bytes(data))


def clean_replica(faulted: pathlib.Path, cleaned: pathlib.Path,
                  reports: dict[str, dict]) -> None:
    """File-level drop per the quarantine report (the reference drops the
    FILE, so cleaning is a byte-exact copy of the approved files)."""
    for t, rep in reports.items():
        d = cleaned / f"{t}.parquet"
        d.mkdir(parents=True)
        for i, path in enumerate(rep["readable"]):
            shutil.copyfile(path, d / f"part-{i:05d}.parquet")


# ------------------------------------------------------------ part A
def sweep_parquet(spark, quick: bool) -> dict:
    import tempfile

    from nbi_oedi_etl_spark.sources.parquet import TABLES
    from nbi_oedi_etl_spark.sources.quarantine import read_with_quarantine

    out: dict = {"tables": {}, "registry": {}}
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="fault-sweep-"))
    faulted, cleaned, flipped = tmp / "faulted", tmp / "cleaned", tmp / "bitflip_mid"
    build_faulted_replica(SRC_SF, faulted)
    build_bitflip_mid_replica(SRC_SF, flipped)

    reports: dict[str, dict] = {}
    for t in TABLES:
        rec: dict = {}
        tdir = faulted / f"{t}.parquet"
        pristine_rows = spark.read.parquet(f"{SRC_SF}/{t}.parquet").count()

        # 2. loud-fail under default semantics (any exception is a valid
        # loud failure; setup errors can't hide here because the pristine
        # read above already succeeded for this table)
        try:
            spark.read.parquet(str(tdir)).count()
            rec["loud_fail"] = False  # silent success = contract violation
        except Exception:
            rec["loud_fail"] = True

        # 3. quarantine drop-and-report
        parts = sorted(str(p) for p in tdir.iterdir())
        df, rep = read_with_quarantine(spark, parts)
        rec["quarantined"] = [pathlib.Path(p).name for p in rep.quarantined]
        rec["quarantine_exact"] = sorted(rec["quarantined"]) == sorted(_PLANTED)
        rec["rows_pristine"] = pristine_rows
        rec["rows_after_quarantine"] = df.count()
        rec["rows_kept"] = rec["rows_after_quarantine"] == pristine_rows
        reports[t] = {"readable": rep.readable}

        # no false positives on pristine inputs
        _, rep_ok = read_with_quarantine(spark, [f"{SRC_SF}/{t}.parquet"])
        rec["pristine_false_positives"] = len(rep_ok.quarantined)

        # 5. bitflip-mid probe: record, don't assert — and compare VALUES,
        # not counts (a flip inside a data page can decode to altered
        # values at the same cardinality; whether the reader detects it
        # depends on page CRCs being written AND verified)
        try:
            a = _result_digest(spark.read.parquet(str(flipped / f"{t}.parquet")))
            b = _result_digest(spark.read.parquet(f"{SRC_SF}/{t}.parquet"))
            if a == b:
                rec["bitflip_mid"] = "read-ok-values-equal"
            elif a[0] == b[0]:
                rec["bitflip_mid"] = "read-ok-values-SILENTLY-ALTERED"
            else:
                rec["bitflip_mid"] = "read-ok-rows-differ"
        except Exception:
            rec["bitflip_mid"] = "loud-fail"
        out["tables"][t] = rec

    # 4. cleaned replica -> full registry, exact match vs pristine
    clean_replica(faulted, cleaned, reports)
    from nbi_oedi_etl_spark import workload

    qs = workload.queries()
    names = sorted(qs)
    if quick:
        names = names[::12]
    mismatches, errors = [], []
    for i, name in enumerate(names):
        try:
            a = _result_digest(qs[name](spark, str(cleaned)))
            b = _result_digest(qs[name](spark, SRC_SF))
            if a != b:
                mismatches.append(name)
        except Exception as e:  # a query erroring on cleaned data = failure
            errors.append({"query": name, "err": repr(e)[:200]})
        if (i + 1) % 40 == 0:
            print(f"  registry {i + 1}/{len(names)}", flush=True)
    out["registry"] = {
        "n_queries": len(names),
        "mismatches": mismatches,
        "errors": errors,
    }

    # 6. trust-boundary ingest (sources.quarantine.ingest_untrusted): the
    # faulted replica re-encoded through the CRC-checksummed engine sink
    # must (a) quarantine exactly the planted files, (b) reconcile rows
    # in vs out against pristine, and (c) close the bitflip_mid residue —
    # a mid-file flip on the RE-ENCODED copy must be caught loudly or land
    # in dead bytes, never silently alter values (the external CRC-less
    # hazard recorded above no longer applies after the defensive copy).
    from nbi_oedi_etl_spark.sources.quarantine import ingest_untrusted

    ingest: dict[str, dict] = {}
    for t in TABLES:
        parts = sorted(str(p) for p in (faulted / f"{t}.parquet").iterdir())
        dest = tmp / "ingested" / f"{t}.parquet"
        rep = ingest_untrusted(spark, parts, str(dest))
        rec = {
            "quarantine_exact": sorted(
                pathlib.Path(p).name for p in rep.files.quarantined
            ) == sorted(_PLANTED),
            "rows_read": rep.rows_read,
            "rows_written": rep.rows_written,
            "reconciled": rep.reconciled
            and rep.rows_read == out["tables"][t]["rows_pristine"],
        }
        part = max(
            (p for p in dest.iterdir() if p.name.endswith(".parquet")),
            key=lambda p: p.stat().st_size,
        )
        data = bytearray(part.read_bytes())
        data[len(data) // 2] ^= 0xFF
        fd = tmp / "ingest_flip" / t
        fd.mkdir(parents=True)
        (fd / "part-00000.parquet").write_bytes(bytes(data))
        try:
            a = _result_digest(spark.read.parquet(str(fd)))
            b = _result_digest(spark.read.parquet(str(part)))
            if a == b:
                rec["reencoded_bitflip"] = "read-ok-values-equal"
            elif a[0] == b[0]:
                rec["reencoded_bitflip"] = "read-ok-values-SILENTLY-ALTERED"
            else:
                rec["reencoded_bitflip"] = "read-ok-rows-differ"
        except Exception:
            rec["reencoded_bitflip"] = "loud-fail"
        ingest[t] = rec
    out["ingest"] = ingest

    shutil.rmtree(tmp, ignore_errors=True)
    return out


def _result_digest(df) -> tuple[int, str]:
    rows = sorted(repr(r) for r in df.collect())
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
    return len(rows), h.hexdigest()


# ------------------------------------------------------------ part B
def _adversarial_payloads() -> dict[str, list[bytes]]:
    """Adversarial byte payloads per codec family. Deterministic (seeded)."""
    import random
    import struct

    from nbi_oedi_etl_spark.operators import multimodal as mm
    from nbi_oedi_etl_spark.operators import webp as webp_mod
    from nbi_oedi_etl_spark.operators.jpeg import encode_jpeg_gray

    rnd = random.Random(0xFA017)
    real = {
        "png": mm.encode_png(4, 3, bytes(range(36))),
        "bmp": mm.encode_bmp(4, 3, bytes(range(36))),
        "jpeg": encode_jpeg_gray(8, 8, [[7] + [0] * 63]),
        "webp": webp_mod.encode_webp_vp8l(4, 3, bytes(range(36))),
        "wav": mm.encode_wav(8000, list(range(-32, 32))),
    }
    magics = {
        "png": mm.PNG_SIGNATURE,
        "bmp": b"BM",
        "jpeg": b"\xff\xd8\xff",
        "webp": b"RIFF\x00\x01\x00\x00WEBP",
        "wav": b"RIFF\x00\x01\x00\x00WAVE",
    }
    oversized = {
        # PNG IHDR declaring 2^30 x 2^30
        "png": mm.PNG_SIGNATURE
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBBBBB", 1 << 30, 1 << 30, 8, 2, 0, 0, 0)
        + b"\x00" * 4,
        # BMP header declaring huge dims
        "bmp": b"BM" + b"\x00" * 16 + struct.pack("<ii", 1 << 28, 1 << 28) + b"\x00" * 40,
        # JPEG SOF0 with 65500x65500
        "jpeg": b"\xff\xd8\xff\xc0" + struct.pack(">HBHHB", 11, 8, 65500, 65500, 1)
        + b"\x01\x11\x00\xff\xd9",
        # VP8L declaring 16383x16383 in a ~10-byte stream
        "webp": b"RIFF\x10\x00\x00\x00WEBPVP8L\x06\x00\x00\x00\x2f\xff\xff\xff\xff\x00",
        # WAV data chunk declaring 2^31 bytes with a 16-byte body
        "wav": b"RIFF\xff\xff\xff\x7fWAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", (1 << 31) - 1) + b"\x00" * 16,
    }
    fams: dict[str, list[bytes]] = {}
    for fam, blob in real.items():
        cases = [b"", magics[fam], oversized[fam]]
        cases += [blob[:k] for k in range(1, len(blob), 7)]  # truncations
        cases += [magics[fam] + bytes([i % 251]) * 64 for i in (1, 7)]  # cyclic
        cases += [magics[fam] + rnd.randbytes(96) for _ in range(8)]  # random
        fams[fam] = cases
    return fams


def sweep_codecs(spark) -> dict:
    import pandas as pd

    from nbi_oedi_etl_spark.operators import multimodal as mm

    fams = _adversarial_payloads()
    out: dict = {"families": {}, "query_level": {}}
    worst = 0.0
    for fam, cases in fams.items():
        decode = mm.decode_wav if fam == "wav" else mm.decode_image_real
        n_ok = 0
        bad: list[str] = []
        fam_worst = 0.0
        for i, payload in enumerate(cases):
            t0 = time.monotonic()
            try:
                decode(payload)
                kind = "DECODED"  # a truncation prefix may still be valid
            except (ValueError, NotImplementedError):
                kind = "quarantined"
            except BaseException as e:  # MemoryError, IndexError, ... = bug
                kind = f"CRASH:{type(e).__name__}"
            dt = time.monotonic() - t0
            fam_worst = max(fam_worst, dt)
            if kind == "quarantined" and dt <= TIME_BUDGET_S:
                n_ok += 1
            elif kind != "DECODED":
                bad.append(f"case{i}:{kind}:{dt:.2f}s")
        out["families"][fam] = {
            "cases": len(cases),
            "quarantined_in_budget": n_ok,
            "violations": bad,
            "worst_decode_s": round(fam_worst, 3),
        }
        worst = max(worst, fam_worst)

    # query-level: adversarial payloads through the mapInPandas surface
    # must become decoded_ok=False rows, never a job failure
    img_cases = [
        (f"{fam}-{i}", payload)
        for fam in ("png", "bmp", "jpeg", "webp")
        for i, payload in enumerate(fams[fam][:40])
        if payload  # extract_image_features requires non-null, see oracle
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(img_cases)),
            "payload": [p for _, p in img_cases],
            "mime": ["application/octet-stream"] * len(img_cases),
        }
    )
    sdf = spark.createDataFrame(pdf)
    feats = mm.extract_image_features(sdf).collect()
    n_false = sum(1 for r in feats if not r["decoded_ok"])
    out["query_level"]["image"] = {
        "n_inputs": len(img_cases),
        "rows": len(feats),
        "decoded_ok_false": n_false,
        "decoded_ok_true": len(feats) - n_false,
    }
    wav_pdf = pd.DataFrame(
        {
            "doc_id": range(len(fams["wav"][:40])),
            "payload": fams["wav"][:40],
            "mime": ["audio/wav"] * len(fams["wav"][:40]),
        }
    ).loc[lambda d: d.payload.map(len) > 0]
    wfeats = mm.extract_wav_features(spark.createDataFrame(wav_pdf)).collect()
    out["query_level"]["wav"] = {
        "n_inputs": len(wav_pdf),
        "rows": len(wfeats),
        "decoded_ok_false": sum(1 for r in wfeats if not r["decoded_ok"]),
    }
    out["worst_decode_s"] = round(worst, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="registry subsample (1 in 12) instead of all queries")
    args = ap.parse_args()

    from nbi_oedi_etl_spark import get_spark

    spark = get_spark(app_name="fault-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    result = {
        "sf_dir": SRC_SF,
        "quick": args.quick,
        "parquet": sweep_parquet(spark, args.quick),
        "codecs": sweep_codecs(spark),
    }
    result["wall_s"] = round(time.monotonic() - t0, 1)

    # ---- verdict ----
    tables = result["parquet"]["tables"]
    failures: list[str] = []
    for t, rec in tables.items():
        if not rec["loud_fail"]:
            failures.append(f"{t}: default read did NOT fail loudly")
        if not rec["quarantine_exact"]:
            failures.append(f"{t}: quarantine set {rec['quarantined']}")
        if not rec["rows_kept"]:
            failures.append(f"{t}: rows lost after quarantine")
        if rec["pristine_false_positives"]:
            failures.append(f"{t}: quarantine false positive on pristine input")
    for t, rec in result["parquet"]["ingest"].items():
        if not rec["quarantine_exact"]:
            failures.append(f"ingest {t}: wrong quarantine set")
        if not rec["reconciled"]:
            failures.append(
                f"ingest {t}: rows not reconciled "
                f"({rec['rows_read']} read / {rec['rows_written']} written)"
            )
        if rec["reencoded_bitflip"] in (
            "read-ok-values-SILENTLY-ALTERED",
            "read-ok-rows-differ",
        ):
            failures.append(
                f"ingest {t}: re-encoded copy corrupted SILENTLY "
                f"({rec['reencoded_bitflip']})"
            )
    reg = result["parquet"]["registry"]
    failures += [f"registry mismatch: {m}" for m in reg["mismatches"]]
    failures += [f"registry error: {e['query']}: {e['err']}" for e in reg["errors"]]
    for fam, rec in result["codecs"]["families"].items():
        failures += [f"codec {fam} {v}" for v in rec["violations"]]
    # query-level surfaces must return one row per input payload — a row
    # deficit means a payload crashed the mapInPandas batch instead of
    # quarantining per-row. decoded_ok=True cases are NOT failures here
    # (truncation prefixes of a valid stream can be complete streams);
    # per-payload agreement with direct decode is pinned in
    # tests/test_fault_sweep.py.
    img = result["codecs"]["query_level"]["image"]
    if img["rows"] != img["n_inputs"]:
        failures.append(
            f"image query surface dropped rows: {img['rows']}/{img['n_inputs']}"
        )
    wav = result["codecs"]["query_level"]["wav"]
    if wav["rows"] != wav["n_inputs"]:
        failures.append(
            f"wav query surface dropped rows: {wav['rows']}/{wav['n_inputs']}"
        )
    result["failures"] = failures
    result["ok"] = not failures

    out = _REPO / "FAULT_SWEEP.json"
    out.write_text(json.dumps(result, indent=1, sort_keys=True))
    print(json.dumps({"ok": result["ok"], "failures": failures[:20],
                      "wall_s": result["wall_s"]}))
    spark.stop()
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
