"""Pure-Python JPEG codec (ITU-T T.81) — stdlib + numpy only.

Closes the multimodal tier's jpeg stub with a REAL codec: the encoder
writes baseline sequential DCT JPEGs (8-bit, grayscale or 4:4:4 YCbCr,
standard Annex-K quantization/Huffman tables, libjpeg-style quality
scaling) and — via :func:`make_progressive_jpeg_payload` — progressive
(SOF2) JPEGs with per-scan frequency-optimal Huffman tables (T.81 K.2).
The decoder parses the marker stream and reads the quantization AND
Huffman tables FROM THE FILE (DQT/DHT segments), so it decodes any
spec-compliant baseline OR progressive JPEG within its documented
envelope:

- baseline sequential (SOF0) and progressive (SOF2, Annex G: spectral
  selection + successive approximation, DC/AC first and refinement
  scans, EOB-run batching); other SOF classes (lossless, arithmetic,
  hierarchical, 12-bit) raise NotImplementedError;
- 8-bit precision, 1 (grayscale) or 3 (YCbCr) components;
- ANY sampling-factor layout on decode (4:4:4, the photographic-default
  4:2:0, 4:2:2, ...): general MCU interleave + replication upsampling;
  the encoder emits 4:4:4 or 4:2:0 (``subsampling=`` parameter);
- restart intervals (DRI + RSTn) on both sides: the decoder byte-aligns
  and resets DC predictors at each boundary, the encoder emits them via
  ``restart_interval=`` (the error-resilience feature most native
  encoders have on by default).

JPEG is lossy: round-trips are verified by PSNR, not byte equality
(tests/test_llm_ops.py). Everything is deterministic — fixed tables,
numpy float64 DCT — so the same input always yields the same bytes.
"""

from __future__ import annotations

import struct

import numpy as np

# -- constants (ITU-T T.81 Annex K) -----------------------------------------

#: zigzag scan order: index i of the scan → (row, col) flat index
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

#: standard Huffman specs: (bits[1..16] code counts, symbol values)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

#: orthonormal 8x8 DCT-II matrix; forward = D @ block @ D.T
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.sqrt(0.25) * np.cos((2 * _n + 1) * _k * np.pi / 16)
_D[0, :] *= 1 / np.sqrt(2)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """(bits, vals) → {symbol: (code, length)} canonical Huffman codes."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(bits, vals) → {(length, code): symbol} for the bit-reader."""
    enc = _canonical_codes(bits, vals)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = min(max(int(quality), 1), 100)
    scale = 5000 / q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = np.floor((base * scale + 50) / 100)
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, length: int) -> None:
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def align_marker(self, marker_byte: int) -> None:
        """Pad to the byte edge and append a bare 0xFF<marker> (RSTn) —
        marker bytes are NOT entropy data, so no stuffing applies."""
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, marker_byte])

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """Value → (size category, appended bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(
    w: _BitWriter,
    coefs: np.ndarray,
    pred_dc: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    zz = coefs[ZIGZAG]
    dc = int(zz[0])
    size, bits = _magnitude(dc - pred_dc)
    code, ln = dc_codes[size]
    w.write(code, ln)
    if size:
        w.write(bits, size)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    end = (last_nz[-1] + 1) if len(last_nz) else 0
    for i in range(1, end + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL: 16 zeros
            w.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        w.write(code, ln)
        w.write(bits, size)
        run = 0
    if end < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return dc


def make_jpeg_payload(
    pixels: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline sequential JPEG (standard tables, deterministic).
    ``subsampling``: "444" (one block per component per MCU) or "420"
    (2x2 luma blocks + one block of each 2x2-mean-downsampled chroma per
    16x16 MCU — the photographic default, ~30% smaller at equal
    quality; ignored for grayscale)."""
    px = np.asarray(pixels)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    sub420 = subsampling == "420" and not gray
    qt_l, qt_c = _quality_tables(quality)
    if gray:
        raw_planes = [px.astype(np.float64)]
        qts = [qt_l]
        samps = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(px.astype(np.float64))
        raw_planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qts = [qt_l, qt_c, qt_c]
        samps = [(2, 2), (1, 1), (1, 1)] if sub420 else [(1, 1)] * 3
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    # pad to MCU multiples by edge replication, then per-plane downsample
    ph = -(-h // (8 * vmax)) * 8 * vmax
    pw = -(-w // (8 * hmax)) * 8 * hmax
    planes = []
    for (hi, vi), p in zip(samps, raw_planes):
        p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:  # 2x2 mean downsample for subsampled chroma
            p = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        planes.append(p)

    dc_l = _canonical_codes(*DC_LUMA_SPEC)
    ac_l = _canonical_codes(*AC_LUMA_SPEC)
    dc_c = _canonical_codes(*DC_CHROMA_SPEC)
    ac_c = _canonical_codes(*AC_CHROMA_SPEC)
    comp_codes = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)

    writer = _BitWriter()
    preds = [0] * len(planes)
    # hoist the per-component flat quant divisor out of the hot loop
    # (qts entries are already flat 64-vectors; rebuilding a reshaped
    # copy per 8x8 block is pure allocation churn at video frame rates)
    divisors = [np.asarray(qt, dtype=np.float64).reshape(64) for qt in qts]
    mcu_count = 0
    for my in range(ph // (8 * vmax)):
        for mx in range(pw // (8 * hmax)):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # RST0..RST7 cycle; DC predictors reset at each boundary
                writer.align_marker(
                    0xD0 + (mcu_count // restart_interval - 1) % 8
                )
                preds = [0] * len(planes)
            mcu_count += 1
            for ci, plane in enumerate(planes):
                hi, vi = samps[ci]
                for bv in range(vi):
                    for bh in range(hi):
                        y0 = (my * vi + bv) * 8
                        x0 = (mx * hi + bh) * 8
                        block = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coefs = _D @ block @ _D.T
                        qzd = np.round(coefs.reshape(64) / divisors[ci])
                        preds[ci] = _encode_block(
                            writer, qzd.astype(np.int64), preds[ci], *comp_codes[ci]
                        )
    scan = writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    for tq, qt in enumerate(qts[: 2 if not gray else 1]):
        zz = qt.reshape(64)[ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz.tobytes()
    ncomp = 1 if gray else 3
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samps[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + sof
    specs = [(0x00, DC_LUMA_SPEC), (0x10, AC_LUMA_SPEC)]
    if not gray:
        specs += [(0x01, DC_CHROMA_SPEC), (0x11, AC_CHROMA_SPEC)]
    for tc_th, (bits, vals) in specs:
        seg = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + sos + scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _optimal_huffman(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """Frequency-optimal Huffman table per T.81 Annex K.2 — the standard
    two-stage construction (pairwise merge with code-size tracking, then
    BITS adjustment to the 16-bit ceiling, reserving one all-ones code
    via the phantom symbol 256). Returns (bits[1..16], vals) ready for a
    DHT segment. Progressive scans need this because the Annex-K fixed
    AC tables carry no EOBn symbols (run>0, size 0)."""
    freq = [0] * 257
    for s, f in freqs.items():
        freq[s] = f
    freq[256] = 1  # reserved: keeps the all-ones code unassigned
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        v1 = v2 = -1
        for i in range(257):  # least freq, ties → largest value (K.2)
            if freq[i] > 0 and (v1 < 0 or freq[i] <= freq[v1]):
                v1 = i
        for i in range(257):
            if i != v1 and freq[i] > 0 and (v2 < 0 or freq[i] <= freq[v2]):
                v2 = i
        if v2 < 0:
            break
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    i = 32  # ADJUST_BITS: fold code lengths > 16 down (K.2 figure K.3)
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the reserved phantom code (always the longest)
    vals = []
    for size in range(1, 33):
        for sym in range(256):
            if codesize[sym] == size:
                vals.append(sym)
    return bits[1:17], vals


#: libjpeg-style "simple progression" scan scripts: DC first (point
#: transform 1) → coarse AC bands → AC refinements → DC refinement
_PROGRESSIVE_SCRIPT_GRAY = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 1, 63, 1, 0),
    ((0,), 0, 0, 1, 0),
]
_PROGRESSIVE_SCRIPT_COLOR = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def make_progressive_jpeg_payload(
    pixels: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
    scans: list[tuple] | None = None,
) -> bytes:
    """Encode as a PROGRESSIVE JPEG (SOF2, T.81 Annex G): the same
    quantized coefficients as :func:`make_jpeg_payload` split across
    spectral-selection + successive-approximation scans, so a partial
    read renders a coarse image. Because the coefficients are identical,
    ``decode_jpeg`` of this payload is BIT-IDENTICAL to decoding the
    baseline encoding of the same input (asserted in tests). Huffman
    tables are frequency-optimal per scan (T.81 K.2) — required, since
    the fixed Annex-K tables lack the EOBn run symbols progressive AC
    coding uses. ``scans`` overrides the default script with
    (component-tuple, Ss, Se, Ah, Al) entries."""
    px = np.asarray(pixels)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    sub420 = subsampling == "420" and not gray
    qt_l, qt_c = _quality_tables(quality)
    if gray:
        raw_planes = [px.astype(np.float64)]
        qts = [qt_l]
        samps = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(px.astype(np.float64))
        raw_planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qts = [qt_l, qt_c, qt_c]
        samps = [(2, 2), (1, 1), (1, 1)] if sub420 else [(1, 1)] * 3
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    ph = -(-h // (8 * vmax)) * 8 * vmax
    pw = -(-w // (8 * hmax)) * 8 * hmax
    mcus_y, mcus_x = ph // (8 * vmax), pw // (8 * hmax)
    # quantized zigzag coefficient grids — per-block matmul exactly like
    # the baseline encoder (NOT einsum-batched: ~2e-13 ulp drift there can
    # flip np.round at quantization boundaries and break the bit-identity
    # contract with make_jpeg_payload)
    grids = []
    for ci, p in enumerate(raw_planes):
        p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        hi, vi = samps[ci]
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:
            p = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        nby, nbx = p.shape[0] // 8, p.shape[1] // 8
        div = np.asarray(qts[ci], dtype=np.float64).reshape(64)
        g = np.zeros((nby, nbx, 64), np.int32)
        for by in range(nby):
            for bx in range(nbx):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coefs = _D @ block @ _D.T
                g[by, bx] = np.round(coefs.reshape(64) / div)[ZIGZAG].astype(
                    np.int32
                )
        grids.append(g)

    if scans is None:
        scans = _PROGRESSIVE_SCRIPT_GRAY if gray else _PROGRESSIVE_SCRIPT_COLOR
    if gray:
        scans = [s for s in scans if s[0] == (0,)]

    def run_scan(scomps, ss, se, ah, al, emit, bits, rst):
        """Drive one scan's coefficient walk through (emit, bits, rst)
        sinks — called twice per scan: symbol-stats pass, then the real
        entropy pass with the stats-built tables."""
        dri = restart_interval

        def true_dims(ci):
            # non-interleaved scans cover the component's TRUE block grid
            # (T.81 A.2.2), smaller than the MCU-padded grid when sampling
            # factors and image size don't align (e.g. 4:2:0 luma with an
            # odd block-row count) — the ONE formula the decoder walks
            # (_comp_block_dims), reused so encode/decode can't diverge
            hi, vi = samps[ci]
            return _comp_block_dims({"hi": hi, "vi": vi}, w, h, hmax, vmax)

        if ss == 0:  # DC scan
            if len(scomps) == 1:
                ci = scomps[0]
                nby, nbx = true_dims(ci)
                mcus = [[(0, by, bx)] for by in range(nby) for bx in range(nbx)]
            else:
                mcus = []
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        mcu = []
                        for oi, ci in enumerate(scomps):
                            hi, vi = samps[ci]
                            for bv in range(vi):
                                for bhh in range(hi):
                                    mcu.append(
                                        (oi, my * vi + bv, mx * hi + bhh)
                                    )
                        mcus.append(mcu)
            preds = [0] * len(scomps)
            for count, mcu in enumerate(mcus):
                if dri and count and count % dri == 0:
                    rst(count)
                    preds = [0] * len(scomps)
                for oi, by, bx in mcu:
                    ci = scomps[oi]
                    dc = int(grids[ci][by, bx, 0])
                    if ah == 0:
                        v = dc >> al  # arithmetic shift, like the decoder's <<
                        size, b = _magnitude(v - preds[oi])
                        preds[oi] = v
                        emit(("dc", 0 if ci == 0 else 1), size)
                        if size:
                            bits(b, size)
                    else:  # refinement: one raw correction bit per block
                        bits((dc >> al) & 1, 1)
            return
        # AC scan: single component, EOB-run batched (G.1.2.2 / G.1.2.3)
        ci = scomps[0]
        tslot = ("ac", 0)
        grid = grids[ci]
        nby, nbx = true_dims(ci)
        eobrun = 0
        bbuf: list[int] = []  # correction bits pending behind an EOB run

        def flush_eob():
            nonlocal eobrun, bbuf
            if eobrun > 0:
                nbits = eobrun.bit_length() - 1
                emit(tslot, nbits << 4)
                if nbits:
                    bits(eobrun, nbits)
                eobrun = 0
            for bit in bbuf:
                bits(bit, 1)
            bbuf = []

        count = 0
        for by in range(nby):
            for bx in range(nbx):
                if dri and count and count % dri == 0:
                    flush_eob()
                    rst(count)
                count += 1
                zz = grid[by, bx]
                if ah == 0:  # first scan for this band
                    run = 0
                    for k in range(ss, se + 1):
                        t = int(zz[k])
                        sign = t < 0
                        t = (-t if sign else t) >> al
                        if t == 0:
                            run += 1
                            continue
                        flush_eob()
                        while run > 15:
                            emit(tslot, 0xF0)
                            run -= 16
                        size, b = _magnitude(-t if sign else t)
                        emit(tslot, (run << 4) | size)
                        bits(b, size)
                        run = 0
                    if run > 0:
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            flush_eob()
                else:  # refinement scan
                    absv = [
                        (abs(int(zz[k]))) >> al for k in range(ss, se + 1)
                    ]
                    eobpos = ss - 1
                    for k in range(ss, se + 1):
                        if absv[k - ss] == 1:
                            eobpos = k
                    run = 0
                    pend: list[int] = []  # this block's correction bits
                    for k in range(ss, se + 1):
                        t = absv[k - ss]
                        if t == 0:
                            run += 1
                            continue
                        while run > 15 and k <= eobpos:
                            flush_eob()
                            emit(tslot, 0xF0)
                            run -= 16
                            for bit in pend:
                                bits(bit, 1)
                            pend = []
                        if t > 1:  # history-nonzero: correction bit
                            pend.append(t & 1)
                            continue
                        flush_eob()
                        emit(tslot, (run << 4) | 1)
                        bits(0 if int(zz[k]) < 0 else 1, 1)
                        for bit in pend:
                            bits(bit, 1)
                        pend = []
                        run = 0
                    if run > 0 or pend:
                        eobrun += 1
                        bbuf.extend(pend)
                        if eobrun == 0x7FFF or len(bbuf) > 900:
                            flush_eob()
        flush_eob()

    out = bytearray(b"\xff\xd8")  # SOI
    for tq, qt in enumerate(qts[: 1 if gray else 2]):
        zz = qt.reshape(64)[ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz.tobytes()
    ncomp = 1 if gray else 3
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samps[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += b"\xff\xc2" + sof  # SOF2: progressive DCT
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    for scomps, ss, se, ah, al in scans:
        freqs: dict[tuple, dict[int, int]] = {}

        def count_sym(slot, sym):
            freqs.setdefault(slot, {})
            freqs[slot][sym] = freqs[slot].get(sym, 0) + 1

        run_scan(
            scomps, ss, se, ah, al,
            emit=count_sym, bits=lambda v, n: None, rst=lambda c: None,
        )
        tables = {}
        for slot, f in sorted(freqs.items()):
            tbits, tvals = _optimal_huffman(f)
            tables[slot] = _canonical_codes(tbits, tvals)
            tc = 0x00 if slot[0] == "dc" else 0x10
            seg = bytes([tc | slot[1]]) + bytes(tbits) + bytes(tvals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
        sos = struct.pack(">HB", 6 + 2 * len(scomps), len(scomps))
        for ci in scomps:
            if ss == 0:
                tt = ((0 if ci == 0 else 1) << 4) | 0
            else:
                tt = 0x00  # AC table slot 0, redefined per scan
            sos += bytes([ci + 1, tt])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + sos
        writer = _BitWriter()

        def emit_real(slot, sym):
            code, ln = tables[slot][sym]
            writer.write(code, ln)

        def rst_real(count):
            writer.align_marker(
                0xD0 + (count // restart_interval - 1) % 8
            )

        run_scan(
            scomps, ss, se, ah, al,
            emit=emit_real, bits=writer.write, rst=rst_real,
        )
        out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _destuff_scan(data: bytes, pos: int) -> tuple[bytes, list[int], int]:
    """Extract the entropy-coded segment starting at ``pos``: drop byte
    stuffing (0xFF00 → 0xFF), record restart-marker positions as
    DESTUFFED byte offsets (segment boundaries), stop at any other
    marker (EOI / next header). One linear pass — the per-bit
    stuffed-byte checks were the decoder's hot path. Returns
    (entropy bytes, restart boundaries, file offset of the terminating
    marker) — the offset is what lets a progressive decoder resume the
    marker walk after each of its many scans."""
    out = bytearray()
    boundaries: list[int] = []
    n = len(data)
    while pos < n:
        nxt = data.find(b"\xff", pos)
        if nxt == -1:
            out += data[pos:]
            pos = n
            break
        out += data[pos:nxt]
        mk = data[nxt + 1] if nxt + 1 < n else 0xD9
        if mk == 0x00:
            out.append(0xFF)
            pos = nxt + 2
        elif 0xD0 <= mk <= 0xD7:
            boundaries.append(len(out))
            pos = nxt + 2
        else:  # real marker: entropy data over
            pos = nxt
            break
    return bytes(out), boundaries, pos


class _FastBits:
    """MSB-first bit cursor over destuffed entropy bytes. Reads use plain
    int arithmetic over an 8-byte window — no per-bit Python calls."""

    __slots__ = ("data", "bitpos", "_pad")

    def __init__(self, data: bytes) -> None:
        # 1-padding past the end mirrors the spec's final-byte padding
        self.data = data + b"\xff" * 8
        self.bitpos = 0

    def peek16(self) -> int:
        byte0 = self.bitpos >> 3
        window = int.from_bytes(self.data[byte0 : byte0 + 3], "big")
        return (window >> (8 - (self.bitpos & 7))) & 0xFFFF

    def take(self, n: int) -> int:
        byte0 = self.bitpos >> 3
        window = int.from_bytes(self.data[byte0 : byte0 + 5], "big")
        v = (window >> (40 - (self.bitpos & 7) - n)) & ((1 << n) - 1)
        self.bitpos += n
        return v

    def align_to(self, byte_offset: int) -> None:
        self.bitpos = byte_offset * 8


def _flat_table(table: dict[tuple[int, int], int]) -> tuple[list[int], list[int]]:
    """{(length, code): symbol} → two 65536-entry lists (symbol, length)
    indexed by the NEXT 16 bits of the stream — one list lookup per
    Huffman decode instead of a bit-by-bit dict walk."""
    syms = [-1] * 65536
    lens = [0] * 65536
    for (ln, code), sym in table.items():
        base = code << (16 - ln)
        for i in range(base, base + (1 << (16 - ln))):
            syms[i] = sym
            lens[i] = ln
    return syms, lens


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _idct_zz_blocks(zz: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(n, 64) zigzag quantized coefficients + flat quant table →
    (n, 8, 8) spatial blocks with the +128 level shift — the ONE
    dequant+IDCT both decode paths (baseline, progressive) share, so a
    numerical change can never diverge them."""
    n_blk = zz.shape[0]
    nat = np.zeros((n_blk, 64))
    nat[:, ZIGZAG] = zz.astype(np.float64) * qt[ZIGZAG][None, :]
    return (
        np.einsum("ij,njk,kl->nil", _D.T, nat.reshape(n_blk, 8, 8), _D) + 128.0
    )


def _finish_image(
    planes: list[np.ndarray],
    comps: list[dict],
    h: int,
    w: int,
    hmax: int,
    vmax: int,
) -> tuple[np.ndarray, dict]:
    """Per-component planes → (image, meta): replication-upsample
    subsampled components, crop the MCU padding to (h, w), and clip
    grayscale / convert YCbCr — shared by both decode paths."""
    full = []
    for c, p in zip(comps, planes):
        if c["vi"] < vmax or c["hi"] < hmax:
            p = np.repeat(
                np.repeat(p, vmax // c["vi"], axis=0), hmax // c["hi"], axis=1
            )
        full.append(p[:h, :w])
    meta = {"width": w, "height": h, "n_components": len(full)}
    if len(full) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8), meta
    return _ycbcr_to_rgb(full[0], full[1], full[2]), meta


def _comp_block_dims(
    comp: dict, w: int, h: int, hmax: int, vmax: int
) -> tuple[int, int]:
    """A component's TRUE block-grid dims (T.81 A.1.1): the non-interleaved
    scan unit count, which is smaller than the MCU-padded grid."""
    cw = -(-(w * comp["hi"]) // hmax)
    ch = -(-(h * comp["vi"]) // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_progressive_scan(
    payload: bytes,
    scan_start: int,
    seg: bytes,
    comps: list[dict],
    htables: dict[int, dict],
    dri: int,
    grids: list[np.ndarray],
    hmax: int,
    vmax: int,
    w: int,
    h: int,
) -> int:
    """Decode ONE progressive scan (T.81 Annex G) into the per-component
    zigzag coefficient grids; returns the file offset of the marker that
    terminates the scan's entropy data. Handles all four scan kinds —
    DC first/refine (interleaved or single-component) and AC first/refine
    (single-component, EOB-run batched) — plus restart intervals (byte
    align, DC-predictor + EOB-run reset)."""
    ns = seg[0]
    order: list[tuple[int, int, int]] = []  # (comp index, dc table, ac table)
    for i in range(ns):
        cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
        ci = next(
            (j for j, c in enumerate(comps) if c["id"] == cid), None
        )
        if ci is None:
            raise ValueError(f"scan references undefined component id {cid}")
        order.append((ci, tt >> 4, tt & 0xF))
    ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
    ah, al = a >> 4, a & 0xF
    ent, rst_bounds, end_pos = _destuff_scan(payload, scan_start)
    r = _FastBits(ent)
    rst_iter = iter(rst_bounds)

    flat: dict[int, tuple[list[int], list[int]]] = {}

    def huff(tc_th: int) -> int:
        t = flat.get(tc_th)
        if t is None:
            if tc_th not in htables:
                raise ValueError(
                    f"scan references undefined Huffman table 0x{tc_th:02X}"
                )
            t = flat[tc_th] = _flat_table(htables[tc_th])
        syms, lens = t
        idx = r.peek16()
        s = syms[idx]
        if s < 0:
            raise ValueError("invalid Huffman code in scan data")
        r.bitpos += lens[idx]
        return s

    def align_restart() -> None:
        try:
            r.align_to(next(rst_iter))
        except StopIteration:
            raise ValueError("missing restart marker in scan data") from None

    if ss == 0:  # DC scan (first or refinement)
        if se != 0:
            raise ValueError("progressive DC scan must have Se == 0")
        # unit walk: MCU-interleaved when several components, the single
        # component's own block grid otherwise
        mcus: list[list[tuple[int, int, int]]] = []
        if ns == 1:
            ci = order[0][0]
            bh, bw = _comp_block_dims(comps[ci], w, h, hmax, vmax)
            mcus = [[(0, by, bx)] for by in range(bh) for bx in range(bw)]
        else:
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    mcu = []
                    for oi, (ci, _, _) in enumerate(order):
                        c = comps[ci]
                        for bv in range(c["vi"]):
                            for bhh in range(c["hi"]):
                                mcu.append(
                                    (oi, my * c["vi"] + bv, mx * c["hi"] + bhh)
                                )
                    mcus.append(mcu)
        preds = [0] * len(order)
        for count, mcu in enumerate(mcus):
            if dri and count and count % dri == 0:
                align_restart()
                preds = [0] * len(order)
            for oi, by, bx in mcu:
                ci, dc_id, _ = order[oi]
                blk = grids[ci][by, bx]
                if ah == 0:
                    s = huff(dc_id)
                    diff = _extend(r.take(s), s) if s else 0
                    preds[oi] += diff
                    blk[0] = preds[oi] << al
                else:  # refinement: one correction bit per block, no tables
                    if r.take(1):
                        blk[0] = int(blk[0]) | (1 << al)
        return end_pos

    # AC scan: single component only (T.81 G.1.1.1.1)
    if ns != 1:
        raise ValueError("progressive AC scan must be single-component")
    ci, _, ac_id = order[0]
    ac_key = 0x10 | ac_id
    bh, bw = _comp_block_dims(comps[ci], w, h, hmax, vmax)
    grid = grids[ci]
    p1, m1 = 1 << al, -(1 << al)
    eobrun = 0
    count = 0
    for by in range(bh):
        for bx in range(bw):
            if dri and count and count % dri == 0:
                align_restart()
                eobrun = 0
            count += 1
            blk = grid[by, bx]
            if ah == 0:  # first AC scan for this band
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = huff(ac_key)
                    rr, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if rr != 15:  # EOBn: run of 2^rr (+bits) blocks
                            eobrun = (1 << rr) - 1
                            if rr:
                                eobrun += r.take(rr)
                            break
                        k += 16  # ZRL
                        continue
                    k += rr
                    if k > se:
                        raise ValueError(
                            "AC index out of range in progressive scan"
                        )
                    blk[k] = _extend(r.take(s), s) << al
                    k += 1
            else:  # AC refinement (G.1.2.3): correction bits interleave
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = huff(ac_key)
                        rr, s = rs >> 4, rs & 0xF
                        val = 0
                        if s == 0:
                            if rr != 15:
                                eobrun = 1 << rr
                                if rr:
                                    eobrun += r.take(rr)
                                break
                            # rr == 15: ZRL — skip 16 zero-history coefs
                        else:
                            if s != 1:
                                raise ValueError(
                                    "invalid refinement symbol in "
                                    "progressive scan"
                                )
                            val = p1 if r.take(1) else m1
                        while k <= se:
                            coef = int(blk[k])
                            if coef != 0:
                                # history-nonzero: consume a correction bit
                                if r.take(1) and (coef & p1) == 0:
                                    blk[k] = coef + (p1 if coef >= 0 else m1)
                            else:
                                if rr == 0:
                                    break
                                rr -= 1
                            k += 1
                        if val:
                            if k > se:
                                raise ValueError(
                                    "AC index out of range in progressive "
                                    "scan"
                                )
                            blk[k] = val
                        k += 1
                if eobrun > 0:
                    # inside an EOB run: only correction bits for
                    # history-nonzero coefficients remain in this block
                    while k <= se:
                        coef = int(blk[k])
                        if coef != 0:
                            if r.take(1) and (coef & p1) == 0:
                                blk[k] = coef + (p1 if coef >= 0 else m1)
                        k += 1
                    eobrun -= 1
    return end_pos


def decode_jpeg(payload: bytes) -> tuple[np.ndarray, dict]:
    """Decode a baseline sequential JPEG — 8-bit, 1 or 3 components, ANY
    sampling-factor layout (4:4:4, 4:2:0, 4:2:2, ...; subsampled planes
    are decoded per-MCU and upsampled by replication), restart intervals
    honored (byte-align + DC-predictor reset at each RSTn). Quantization
    and Huffman tables are read from the file. Returns
    ((h, w[, 3]) uint8 array, {width, height, n_components})."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = dri = 0
    progressive = False
    saw_eoi = False
    grids: list[np.ndarray] | None = None  # per-comp zigzag coef planes (SOF2)
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            saw_eoi = True
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8)
                qt = np.zeros(64)
                qt[ZIGZAG] = zz
                qtables[tq] = qt
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc_th = seg[i]
                bits = list(seg[i + 1 : i + 17])
                nval = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nval])
                htables[tc_th] = _decode_table(bits, vals)
                i += 17 + nval
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            if nc not in (1, 3):
                # 4-component Adobe CMYK/YCCK etc.: feeding the first 3
                # planes through the YCbCr transform would return garbage
                # RGB — the envelope contract is raise, never wrong pixels
                raise NotImplementedError(
                    f"{nc}-component JPEG — only grayscale (1) and "
                    "YCbCr (3) are supported"
                )
            for ci in range(nc):
                cid, samp, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "tq": tq, "hi": samp >> 4, "vi": samp & 0xF}
                )
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI: restart every N MCUs
            dri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — scan follows
            if progressive:
                if grids is None:
                    hmax = max(c["hi"] for c in comps)
                    vmax = max(c["vi"] for c in comps)
                    mcus_x = -(-w // (8 * hmax))
                    mcus_y = -(-h // (8 * vmax))
                    grids = [
                        np.zeros(
                            (mcus_y * c["vi"], mcus_x * c["hi"], 64), np.int32
                        )
                        for c in comps
                    ]
                pos = _decode_progressive_scan(
                    payload, pos + seglen, seg, comps, htables, dri, grids,
                    hmax, vmax, w, h,
                )
                continue
            ns = seg[0]
            order = []
            for ci in range(ns):
                cid, tt = seg[1 + 2 * ci], seg[2 + 2 * ci]
                comp = next(c for c in comps if c["id"] == cid)
                comp["dc"] = htables[(tt >> 4)]
                comp["ac"] = htables[0x10 | (tt & 0xF)]
                order.append(comp)
            ent, rst_bounds, _scan_end = _destuff_scan(payload, pos + seglen)
            r = _FastBits(ent)
            flat_cache: dict[int, tuple[list[int], list[int]]] = {}
            for comp in order:
                for kind in ("dc", "ac"):
                    t = comp[kind]
                    if id(t) not in flat_cache:
                        flat_cache[id(t)] = _flat_table(t)
                    comp[kind + "_flat"] = flat_cache[id(t)]
            hmax = max(c["hi"] for c in order)
            vmax = max(c["vi"] for c in order)
            # MCU grid covers the image at (8*hmax, 8*vmax) granularity;
            # each component's plane holds (vi, hi) blocks per MCU
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            # entropy loop collects per-component zigzag vectors +
            # placements; dequant + IDCT run BATCHED afterwards (one
            # einsum per component instead of two matmuls per block)
            blocks_zz: list[list[list[int]]] = [[] for _ in order]
            blocks_at: list[list[tuple[int, int]]] = [[] for _ in order]
            preds = [0] * len(order)
            mcu_count = 0
            rst_iter = iter(rst_bounds)
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if dri and mcu_count and mcu_count % dri == 0:
                        # restart boundary: byte-align past the RSTn
                        # marker and reset every DC predictor (T.81 E.2.4)
                        try:
                            r.align_to(next(rst_iter))
                        except StopIteration:
                            raise ValueError(
                                "missing restart marker in scan data"
                            ) from None
                        preds = [0] * len(order)
                    mcu_count += 1
                    for ci, comp in enumerate(order):
                        dc_syms, dc_lens = comp["dc_flat"]
                        ac_syms, ac_lens = comp["ac_flat"]
                        for bv in range(comp["vi"]):
                            for bh in range(comp["hi"]):
                                idx = r.peek16()
                                size = dc_syms[idx]
                                if size < 0:
                                    raise ValueError(
                                        "invalid Huffman code in scan data"
                                    )
                                r.bitpos += dc_lens[idx]
                                if size:
                                    preds[ci] += _extend(r.take(size), size)
                                zz = [0] * 64
                                zz[0] = preds[ci]
                                k = 1
                                while k < 64:
                                    idx = r.peek16()
                                    rs = ac_syms[idx]
                                    if rs < 0:
                                        raise ValueError(
                                            "invalid Huffman code in scan data"
                                        )
                                    r.bitpos += ac_lens[idx]
                                    if rs == 0x00:  # EOB
                                        break
                                    if rs == 0xF0:  # ZRL
                                        k += 16
                                        continue
                                    k += rs >> 4
                                    size = rs & 0xF
                                    if size == 0:
                                        # only EOB (0x00) / ZRL (0xF0) may
                                        # carry size 0; anything else is a
                                        # corrupt stream, not 1 << -1
                                        raise ValueError(
                                            "invalid AC symbol in scan data"
                                        )
                                    if k > 63:
                                        raise ValueError("AC index out of range")
                                    zz[k] = _extend(r.take(size), size)
                                    k += 1
                                blocks_zz[ci].append(zz)
                                blocks_at[ci].append(
                                    ((my * comp["vi"] + bv) * 8,
                                     (mx * comp["hi"] + bh) * 8)
                                )
            planes = []
            for ci, comp in enumerate(order):
                blk = _idct_zz_blocks(
                    np.asarray(blocks_zz[ci], dtype=np.float64),
                    qtables[comp["tq"]],
                )
                plane = np.zeros(
                    (mcus_y * comp["vi"] * 8, mcus_x * comp["hi"] * 8)
                )
                for b, (y0, x0) in enumerate(blocks_at[ci]):
                    plane[y0 : y0 + 8, x0 : x0 + 8] = blk[b]
                planes.append(plane)
            return _finish_image(planes, order, h, w, hmax, vmax)
        pos += seglen
    if progressive and grids is not None:
        if not saw_eoi:
            # a progressive stream that ends between scans (torn write /
            # truncated download) would otherwise "finish" from the scans
            # that did arrive and return silently wrong pixels — the one
            # outcome the envelope contract forbids (raise, never wrong
            # pixels; the operators' per-record guard turns this into a
            # flagged row). T.81 requires EOI, so its absence IS the
            # truncation signal.
            raise ValueError(
                "truncated progressive JPEG: stream ended before EOI"
            )
        # all scans accumulated into the coefficient grids — the shared
        # dequant/IDCT/upsample/color tail; blocks are dense row-major,
        # so placement is a pure reshape instead of baseline's scatter
        hmax = max(c["hi"] for c in comps)
        vmax = max(c["vi"] for c in comps)
        planes = []
        for ci, comp in enumerate(comps):
            g = grids[ci]
            nby, nbx = g.shape[:2]
            blk = _idct_zz_blocks(g.reshape(-1, 64), qtables[comp["tq"]])
            planes.append(
                blk.reshape(nby, nbx, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(nby * 8, nbx * 8)
            )
        return _finish_image(planes, comps, h, w, hmax, vmax)
    raise ValueError("no SOS scan found in JPEG stream")
