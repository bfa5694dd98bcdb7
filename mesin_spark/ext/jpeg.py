"""Pure-Python baseline JPEG codec (ITU-T T.81) — stdlib + numpy only.

Closes the multimodal tier's jpeg stub with a REAL codec: the encoder
writes baseline sequential DCT JPEGs (8-bit, grayscale or 4:4:4 YCbCr,
standard Annex-K quantization/Huffman tables, libjpeg-style quality
scaling), and the decoder parses the marker stream and reads the
quantization AND Huffman tables FROM THE FILE (DQT/DHT segments), so it
decodes any spec-compliant baseline JPEG within its documented envelope:

- baseline sequential (SOF0) only — progressive (SOF2) raises
  NotImplementedError;
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


def _destuff_scan(data: bytes, pos: int) -> tuple[bytes, list[int]]:
    """Extract the entropy-coded segment starting at ``pos``: drop byte
    stuffing (0xFF00 → 0xFF), record restart-marker positions as
    DESTUFFED byte offsets (segment boundaries), stop at any other
    marker (EOI / next header). One linear pass — the per-bit
    stuffed-byte checks were the decoder's hot path."""
    out = bytearray()
    boundaries: list[int] = []
    n = len(data)
    while pos < n:
        nxt = data.find(b"\xff", pos)
        if nxt == -1:
            out += data[pos:]
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
            break
    return bytes(out), boundaries


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
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
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
        elif marker == 0xC0:  # SOF0 baseline
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
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI: restart every N MCUs
            dri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — scan follows
            ns = seg[0]
            order = []
            for ci in range(ns):
                cid, tt = seg[1 + 2 * ci], seg[2 + 2 * ci]
                comp = next(c for c in comps if c["id"] == cid)
                comp["dc"] = htables[(tt >> 4)]
                comp["ac"] = htables[0x10 | (tt & 0xF)]
                order.append(comp)
            ent, rst_bounds = _destuff_scan(payload, pos + seglen)
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
                n_blk = len(blocks_zz[ci])
                nat = np.zeros((n_blk, 64))
                nat[:, ZIGZAG] = (
                    np.asarray(blocks_zz[ci], dtype=np.float64)
                    * qtables[comp["tq"]][ZIGZAG][None, :]
                )
                blk = (
                    np.einsum(
                        "ij,njk,kl->nil", _D.T, nat.reshape(n_blk, 8, 8), _D
                    )
                    + 128.0
                )
                plane = np.zeros(
                    (mcus_y * comp["vi"] * 8, mcus_x * comp["hi"] * 8)
                )
                for b, (y0, x0) in enumerate(blocks_at[ci]):
                    plane[y0 : y0 + 8, x0 : x0 + 8] = blk[b]
                planes.append(plane)
            # upsample subsampled planes to full geometry by replication
            full = []
            for c, p in zip(order, planes):
                if c["vi"] < vmax or c["hi"] < hmax:
                    p = np.repeat(
                        np.repeat(p, vmax // c["vi"], axis=0),
                        hmax // c["hi"],
                        axis=1,
                    )
                full.append(p[:h, :w])
            meta = {"width": w, "height": h, "n_components": len(order)}
            if len(order) == 1:
                img = np.clip(full[0], 0, 255).astype(np.uint8)
            else:
                img = _ycbcr_to_rgb(full[0], full[1], full[2])
            return img, meta
        pos += seglen
    raise ValueError("no SOS scan found in JPEG stream")
