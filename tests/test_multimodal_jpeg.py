"""Unit tests for the pure-Python baseline JPEG codec
(operators/jpeg.py) — the paths the DC-only SQL oracle can't reach:
AC run/size coding, ZRL, the full IDCT against an independent naive
implementation, YCbCr color conversion, 4:2:0 chroma upsampling,
restart markers, byte stuffing, and non-baseline rejection.
"""

from __future__ import annotations

import itertools
import math
import random
import time

import numpy as np
import pytest

from nbi_oedi_etl_spark.operators import jpeg


def _naive_idct(zz: list[int], q: list[int]) -> np.ndarray:
    """Textbook O(64²) IDCT straight from the T.81 definition — written
    independently of the codec's matrix form so they cross-check."""
    F8 = np.zeros((8, 8))
    for k in range(64):
        F8[jpeg.ZIGZAG[k] // 8][jpeg.ZIGZAG[k] % 8] = zz[k] * q[k]
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = math.sqrt(0.5) if u == 0 else 1.0
                    cv = math.sqrt(0.5) if v == 0 else 1.0
                    s += (
                        cu * cv * F8[u][v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[x][y] = s / 4.0
    return out


def _gray(data: bytes) -> np.ndarray:
    w, h, c, pix = jpeg.decode_jpeg(data)
    assert c == 1
    return np.frombuffer(pix, dtype=np.uint8).reshape(h, w)


def test_dc_only_blocks_decode_flat_and_exact():
    dcs = [5, -60, 60, 0, 17, -33]
    blocks = [[dc] + [0] * 63 for dc in dcs]
    arr = _gray(jpeg.encode_jpeg_gray(16, 24, blocks))
    for k, dc in enumerate(dcs):
        by, bx = divmod(k, 2)
        blk = arr[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8]
        assert (blk == 128 + 2 * dc).all(), (k, dc)


def test_ac_coefficients_match_independent_idct():
    random.seed(7)
    q = [16] * 64
    blocks = []
    for _ in range(6):
        zz = [0] * 64
        zz[0] = random.randint(-40, 40)
        for _ in range(10):
            zz[random.randint(1, 63)] = random.randint(-20, 20)
        blocks.append(zz)
    arr = _gray(jpeg.encode_jpeg_gray(16, 24, blocks))
    for k, zz in enumerate(blocks):
        by, bx = divmod(k, 2)
        blk = arr[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8].astype(float)
        ref = np.clip(np.round(_naive_idct(zz, q) + 128), 0, 255)
        # both are float64 pipelines; only round-to-int ties can differ
        assert np.abs(blk - ref).max() <= 1


def test_zrl_long_zero_runs_round_trip():
    """A lone coefficient at the end of the zigzag forces ZRL (16-zero
    run) codes — decode must land it at exactly position 63."""
    zz = [0] * 64
    zz[0] = 4
    zz[63] = 7
    q = [16] * 64
    arr = _gray(jpeg.encode_jpeg_gray(8, 8, [zz]))
    ref = np.clip(np.round(_naive_idct(zz, q) + 128), 0, 255)
    assert np.abs(arr.astype(float) - ref).max() <= 1
    # the AC coefficient genuinely changed the image vs DC-only
    assert not (arr == arr[0, 0]).all()


def test_color_444_neutral_chroma_is_grayscale():
    comps = [
        {"id": 1, "h": 1, "v": 1, "blocks": [[[10] + [0] * 63, [20] + [0] * 63]]},
        {"id": 2, "h": 1, "v": 1, "blocks": [[[0] + [0] * 63, [0] + [0] * 63]]},
        {"id": 3, "h": 1, "v": 1, "blocks": [[[0] + [0] * 63, [0] + [0] * 63]]},
    ]
    w, h, c, pix = jpeg.decode_jpeg(jpeg.encode_jpeg(16, 8, comps))
    assert (w, h, c) == (16, 8, 3)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(8, 16, 3)
    assert (arr[:, :8] == 148).all()  # 128 + 2·10, R=G=B at neutral chroma
    assert (arr[:, 8:] == 168).all()


def test_420_subsampled_chroma_upsamples_by_replication():
    ybl = [
        [[8] + [0] * 63, [16] + [0] * 63],
        [[24] + [0] * 63, [-8] + [0] * 63],
    ]
    comps = [
        {"id": 1, "h": 2, "v": 2, "blocks": ybl},
        {"id": 2, "h": 1, "v": 1, "blocks": [[[4] + [0] * 63]]},
        {"id": 3, "h": 1, "v": 1, "blocks": [[[-4] + [0] * 63]]},
    ]
    w, h, c, pix = jpeg.decode_jpeg(jpeg.encode_jpeg(16, 16, comps))
    assert (w, h, c) == (16, 16, 3)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(16, 16, 3).astype(float)
    cb, cr = 128 + 8.0, 128 - 8.0
    for (qy, qx), dc in zip(itertools.product(range(2), range(2)), [8, 16, 24, -8]):
        y = 128 + 2 * dc
        exp = (
            np.clip(round(y + 1.402 * (cr - 128)), 0, 255),
            np.clip(round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)), 0, 255),
            np.clip(round(y + 1.772 * (cb - 128)), 0, 255),
        )
        quad = arr[qy * 8 : (qy + 1) * 8, qx * 8 : (qx + 1) * 8]
        for ch in range(3):
            assert (quad[:, :, ch] == exp[ch]).all(), (qy, qx, ch)


def test_byte_stuffing_round_trips():
    """Find a deterministic payload whose entropy stream contains a
    stuffed 0xFF00, then prove decode still matches the naive IDCT."""
    q = [16] * 64
    found = False
    for seed in range(40):
        random.seed(seed)
        blocks = []
        for _ in range(12):
            zz = [0] * 64
            zz[0] = random.randint(-50, 50)
            for _ in range(20):
                zz[random.randint(1, 63)] = random.randint(-30, 30)
            blocks.append(zz)
        data = jpeg.encode_jpeg_gray(32, 24, blocks)
        scan = data[data.rindex(b"\xff\xda") :]
        if b"\xff\x00" in scan:
            found = True
            arr = _gray(data)
            for k, zz in enumerate(blocks):
                by, bx = divmod(k, 4)
                blk = arr[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8].astype(float)
                ref = np.clip(np.round(_naive_idct(zz, q) + 128), 0, 255)
                assert np.abs(blk - ref).max() <= 1
            break
    assert found, "no seed produced a stuffed byte — widen the search"


def test_clipping_saturates_at_0_and_255():
    arr = _gray(jpeg.encode_jpeg_gray(8, 8, [[120] + [0] * 63]))
    assert (arr == 255).all()
    arr = _gray(jpeg.encode_jpeg_gray(8, 8, [[-120] + [0] * 63]))
    assert (arr == 0).all()


def test_progressive_jpeg_rejected():
    data = bytearray(jpeg.encode_jpeg_gray(8, 8, [[1] + [0] * 63]))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    with pytest.raises(ValueError, match="unsupported JPEG process"):
        jpeg.decode_jpeg(bytes(data))


def test_non_jpeg_rejected():
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg.decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_dispatch_routes_jpeg_through_real_decoder():
    from nbi_oedi_etl_spark.operators import multimodal

    data = jpeg.encode_jpeg_gray(8, 8, [[3] + [0] * 63])
    w, h, c, pix = multimodal.decode_image_real(data)
    assert (w, h, c) == (8, 8, 1)
    assert set(pix) == {128 + 6}


def test_restart_markers_reset_dc_predictors():
    """DRI + RSTn: the decoder must realign to the byte boundary at each
    restart marker and reset every DC predictor — predictor carry-over
    across a restart is the classic corruption bug this pins."""
    dcs = [30, 31, 32, 33, -20, -21]  # nonzero diffs across every boundary
    blocks = [[dc] + [0] * 63 for dc in dcs]
    bx = 3
    grid = [blocks[r * bx : (r + 1) * bx] for r in range(2)]
    data = jpeg.encode_jpeg(
        24, 16, [{"id": 1, "h": 1, "v": 1, "blocks": grid}], restart_interval=2
    )
    assert b"\xff\xdd" in data  # DRI present
    scan = data[data.rindex(b"\xff\xda") :]
    assert b"\xff\xd0" in scan and b"\xff\xd1" in scan  # RST0, RST1 emitted
    w, h, c, pix = jpeg.decode_jpeg(data)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w)
    for k, dc in enumerate(dcs):
        by, bxx = divmod(k, bx)
        blk = arr[by * 8 : (by + 1) * 8, bxx * 8 : (bxx + 1) * 8]
        assert (blk == 128 + 2 * dc).all(), (k, dc, int(blk[0, 0]))


def test_truncated_and_corrupt_payloads_raise_valueerror_only():
    """Corrupt streams must surface as ValueError (the quarantine catch
    in extract_image_features), never IndexError/KeyError."""
    valid = jpeg.encode_jpeg_gray(16, 16, [[d] + [0] * 63 for d in (1, 2, 3, 4)])
    for bad in (
        valid[:-6],            # truncated mid-entropy
        b"\xff\xd8\xff",       # bare SOI + half marker
        valid[: valid.index(b"\xff\xda") + 4],  # cut inside SOS header
    ):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(bad)


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker;
    the walk must not read the fill byte as a marker."""
    data = jpeg.encode_jpeg_gray(8, 8, [[7] + [0] * 63])
    i = data.index(b"\xff\xdb")  # inject fills before DQT
    padded = data[:i] + b"\xff\xff\xff" + data[i:]
    w, h, c, pix = jpeg.decode_jpeg(padded)
    assert (w, h, c) == (8, 8, 1)
    assert set(pix) == {128 + 14}


def test_12bit_precision_rejected():
    data = bytearray(jpeg.encode_jpeg_gray(8, 8, [[1] + [0] * 63]))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC1  # SOF1 (extended sequential) permits 12-bit
    data[i + 4] = 12  # sample precision byte
    with pytest.raises(ValueError, match="sample precision"):
        jpeg.decode_jpeg(bytes(data))


def test_non_interleaved_multi_scan_rejected():
    """A 3-component frame whose SOS covers only one component (the
    non-interleaved coding our MCU loop doesn't implement) must refuse
    rather than emit scrambled pixels."""
    z = [0] * 63
    comps = [
        {"id": 1, "h": 1, "v": 1, "blocks": [[[1] + z]]},
        {"id": 2, "h": 1, "v": 1, "blocks": [[[0] + z]]},
        {"id": 3, "h": 1, "v": 1, "blocks": [[[0] + z]]},
    ]
    data = jpeg.encode_jpeg(8, 8, comps)
    i = data.index(b"\xff\xda")
    # original SOS: len=12, ns=3; rewrite to a 1-component scan header
    one_comp_sos = b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00"
    patched = data[:i] + one_comp_sos + data[i + 14 :]
    with pytest.raises(ValueError, match="non-interleaved"):
        jpeg.decode_jpeg(patched)


# ------------------------- property-based round-trip (hypothesis)

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _zigzag_blocks(draw):
    n_blocks = draw(st.integers(min_value=1, max_value=4))
    blocks = []
    for _ in range(n_blocks):
        zz = [0] * 64
        zz[0] = draw(st.integers(min_value=-60, max_value=60))
        for pos in draw(
            st.lists(st.integers(min_value=1, max_value=63), max_size=12, unique=True)
        ):
            zz[pos] = draw(st.integers(min_value=-30, max_value=30))
        blocks.append(zz)
    return blocks


@settings(max_examples=60, deadline=None)
@given(_zigzag_blocks())
def test_any_coefficient_block_round_trips(blocks):
    """For ANY quantized coefficient content (random DC + up to 12 AC
    coefficients per block), encode→decode must reproduce the naive-IDCT
    reconstruction pixel-for-pixel (± round-half ties). Exercises every
    run/size category, ZRL placement, and DC-diff magnitude the
    generator can reach."""
    q = [16] * 64
    w, h = 8 * len(blocks), 8
    arr = _gray(jpeg.encode_jpeg_gray(w, h, blocks))
    for k, zz in enumerate(blocks):
        blk = arr[0:8, k * 8 : (k + 1) * 8].astype(float)
        ref = np.clip(np.round(_naive_idct(zz, q) + 128), 0, 255)
        assert np.abs(blk - ref).max() <= 1


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_fuzzed_payloads_never_escape_the_quarantine_contract(junk):
    """decode_jpeg on arbitrary bytes (raw, and SOI-prefixed so the
    marker walk actually runs) must either succeed or raise ValueError —
    never IndexError/KeyError/struct.error — because
    extract_image_features' per-row quarantine catches exactly
    (ValueError, NotImplementedError)."""
    for payload in (junk, b"\xff\xd8" + junk):
        try:
            jpeg.decode_jpeg(payload)
        except ValueError:
            pass


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=40), st.integers(min_value=0, max_value=400))
def test_truncations_of_a_valid_jpeg_raise_valueerror(tail, cut):
    """Every truncation point of a real payload (optionally with junk
    appended) stays inside the ValueError contract."""
    data = jpeg.encode_jpeg_gray(16, 16, [[d] + [0] * 63 for d in (9, -9, 33, -33)])
    trunc = data[: min(cut, len(data) - 1)] + tail
    try:
        jpeg.decode_jpeg(trunc)
    except ValueError:
        pass


def _patch_sof_dims(data: bytes, h: int, w: int) -> bytes:
    """Rewrite the SOF0 height/width fields of an encoded stream."""
    i = data.index(b"\xff\xc0")
    # layout after the marker: L(2) precision(1) H(2) W(2) ...
    return (
        data[: i + 5]
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + data[i + 9 :]
    )


def test_adversarial_sof_dimensions_rejected_before_allocation():
    """SOF fields are untrusted: a tiny stream declaring 65535x65535 must
    raise ValueError (quarantinable) immediately — not MemoryError from a
    multi-GB plane allocation, not minutes inside the MCU loop."""
    valid = jpeg.encode_jpeg_gray(8, 8, [[1] + [0] * 63])
    t0 = time.time()
    with pytest.raises(ValueError, match="decoder cap"):
        jpeg.decode_jpeg(_patch_sof_dims(valid, 65535, 65535))
    assert time.time() - t0 < 1.0
    for bad_h, bad_w in ((0, 8), (8, 0)):
        with pytest.raises(ValueError, match="invalid JPEG dimensions"):
            jpeg.decode_jpeg(_patch_sof_dims(valid, bad_h, bad_w))


def test_declared_grid_larger_than_payload_rejected_fast():
    """A stream whose SOF declares far more 8x8 blocks than its entropy
    payload has bits must be refused before the MCU loop: each block costs
    at least one bit, so the grid is provably undecodable."""
    valid = jpeg.encode_jpeg_gray(8, 8, [[1] + [0] * 63])
    t0 = time.time()
    with pytest.raises(ValueError, match="payload too short"):
        jpeg.decode_jpeg(_patch_sof_dims(valid, 4096, 4096))  # 16M px, under cap
    assert time.time() - t0 < 1.0
