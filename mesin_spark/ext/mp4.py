"""Minimal MP4/MJPEG container codec (ISO/IEC 14496-12 ISO BMFF, public
spec) — stdlib + numpy only.

Motion-JPEG inside an ISO Base Media File: each video sample is an
independent baseline-or-progressive JPEG (ext/jpeg.py) addressed by the
standard sample tables (stsd/stts/stsc/stsz/stco), so the video tier
speaks BOTH mainstream container families — RIFF (ext/avi.py) and ISO
BMFF — with pure-Python code. The h264/h265 CODECS remain honest
NotImplementedError stubs (inter-frame decoding genuinely needs native
libraries); a file whose sample description names them is refused with
that error, never mis-decoded.

Writer layout: ftyp → mdat (concatenated JPEG samples — written before
moov so the chunk offsets are known without a fixup pass) → moov
(mvhd + one video trak: tkhd / mdia(mdhd, hdlr 'vide', minf(vmhd, dinf,
stbl))). Reader walks the box tree, resolves the sample-to-chunk map
(general stsc/stco/co64 walk, not a one-chunk shortcut), and decodes
every sample with the JPEG decoder.
"""

from __future__ import annotations

import struct

import numpy as np

from mesin_spark.ext.jpeg import decode_jpeg, make_jpeg_payload

#: stsd sample-entry fourccs this reader can decode (all MJPEG spellings)
_JPEG_FORMATS = (b"jpeg", b"mjpg", b"MJPG", b"mjpa")


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full_box(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + body)


_IDENTITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def make_mp4_payload(
    frames: list[np.ndarray], fps: int = 10, quality: int = 85
) -> bytes:
    """Encode (h, w, 3) uint8 frames as an MP4 file with one MJPEG video
    track (sample entry 'jpeg'). All frames must share one size; the
    track timescale is ``fps`` with one tick per sample."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one (h, w)")
    jpegs = [make_jpeg_payload(f, quality=quality) for f in frames]
    n = len(jpegs)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_body = b"".join(jpegs)
    mdat = _box(b"mdat", mdat_body)
    # single chunk holding every sample; its data starts just past the
    # mdat header, which sits right after ftyp
    chunk_offset = len(ftyp) + 8

    mvhd = _full_box(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, n)          # created/modified/timescale/duration
        + struct.pack(">iH", 0x00010000, 0x0100)     # rate, volume
        + b"\x00" * 10                               # reserved
        + _IDENTITY_MATRIX
        + b"\x00" * 24                               # pre_defined[6]
        + struct.pack(">I", 2),                      # next_track_ID
    )
    tkhd = _full_box(
        b"tkhd", 0, 3,  # enabled | in_movie
        struct.pack(">IIIII", 0, 0, 1, 0, n)         # created/modified/track/rsvd/duration
        + b"\x00" * 8                                # reserved
        + struct.pack(">hhhh", 0, 0, 0, 0)           # layer/group/volume/rsvd
        + _IDENTITY_MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _full_box(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, n) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full_box(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    # VisualSampleEntry 'jpeg' (14496-12 §12.1.3)
    entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)                       # data_reference_index
        + b"\x00" * 16                               # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)                       # frame_count
        + b"\x00" * 32                               # compressorname
        + struct.pack(">Hh", 24, -1)                 # depth, pre_defined
    )
    stsd = _full_box(
        b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"jpeg", entry)
    )
    stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full_box(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(j)) for j in jpegs),
    )
    stco = _full_box(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full_box(
        b"dref", 0, 0, struct.pack(">I", 1) + _full_box(b"url ", 0, 1, b"")
    )
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk_boxes(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [pos, end)."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", buf[pos : pos + 4])
        fourcc = buf[pos + 4 : pos + 8]
        body_at = pos + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
            body_at = pos + 16
        elif size == 0:  # box extends to EOF
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("malformed MP4 box size")
        yield fourcc, body_at, pos + size
        pos += size


def _find_box(buf: bytes, pos: int, end: int, path: list[bytes]) -> tuple[int, int]:
    """Descend the box tree along ``path``; returns the target's body span."""
    for name in path:
        for fourcc, b0, b1 in _walk_boxes(buf, pos, end):
            if fourcc == name:
                pos, end = b0, b1
                break
        else:
            raise ValueError(f"MP4 box {name.decode()!r} not found")
    return pos, end


def video_track_tables(payload: bytes) -> tuple[dict, int]:
    """Locate the FIRST video track and return ({stbl box fourcc:
    (body_start, end)}, mdhd timescale) — the discovery walk (moov →
    trak → mdia → hdlr 'vide' → mdhd/minf/stbl, with the
    version-dependent mdhd timescale offset) shared by decode_mp4 and
    probe_mp4 so the two can never silently diverge. A 'vide' track
    missing stsd/stsz is skipped in favor of a later well-formed video
    track. Raises ValueError when the payload is not ISO BMFF or has no
    usable video track."""
    if payload[4:8] != b"ftyp" and payload[4:8] != b"moov":
        raise ValueError("not an ISO BMFF (MP4) payload")
    moov0, moov1 = _find_box(payload, 0, len(payload), [b"moov"])
    for fourcc, b0, b1 in _walk_boxes(payload, moov0, moov1):
        if fourcc != b"trak":
            continue
        try:
            mdia0, mdia1 = _find_box(payload, b0, b1, [b"mdia"])
            h0, _ = _find_box(payload, mdia0, mdia1, [b"hdlr"])
            if payload[h0 + 8 : h0 + 12] != b"vide":
                continue
            m0, _ = _find_box(payload, mdia0, mdia1, [b"mdhd"])
            version = payload[m0]
            timescale = struct.unpack(
                ">I",
                payload[m0 + (20 if version else 12) : m0 + (24 if version else 16)],
            )[0]
            s0, s1 = _find_box(payload, mdia0, mdia1, [b"minf", b"stbl"])
            boxes = {f: (x0, x1) for f, x0, x1 in _walk_boxes(payload, s0, s1)}
            if b"stsd" not in boxes or b"stsz" not in boxes:
                # A 'vide' track without its sample tables is unusable by
                # BOTH the prober and the decoder — keep walking so a
                # later well-formed video track wins (the pre-r6
                # probe_mp4 tolerance, now shared with decode_mp4).
                continue
            return boxes, timescale
        except ValueError:
            continue
    raise ValueError("no video track found in MP4 payload")


def sample_delta(payload: bytes, boxes: dict) -> int:
    """First stts sample delta (default 1) — fps = timescale / delta;
    externally-authored files commonly carry timescale 600 / delta 60."""
    delta = 1
    if b"stts" in boxes:
        t0, _ = boxes[b"stts"]
        (n_tt,) = struct.unpack(">I", payload[t0 + 4 : t0 + 8])
        if n_tt:
            delta = struct.unpack(">I", payload[t0 + 12 : t0 + 16])[0] or 1
    return delta


def decode_mp4(payload: bytes) -> tuple[list[np.ndarray], dict]:
    """Decode an MP4/MJPEG payload to (frames, meta) via the standard
    sample tables. Grayscale JPEG samples broadcast to (h, w, 3) to keep
    decode_video's contract; h264/h265 sample entries raise
    NotImplementedError (codec stub, container fully parsed)."""
    boxes, timescale = video_track_tables(payload)

    # codec check on the sample description (the authoritative field)
    d0, _ = boxes[b"stsd"]
    fmt = None
    for fourcc, e0, e1 in _walk_boxes(payload, d0 + 8, boxes[b"stsd"][1]):
        fmt = fourcc
        break
    if fmt in (b"avc1", b"avc3", b"hev1", b"hvc1", b"mp4v"):
        raise NotImplementedError(
            f"MP4 video codec {fmt.decode(errors='replace')!r} needs a native "
            "decoder (inter-frame codec) — only MJPEG sample entries are "
            "supported"
        )
    if fmt not in _JPEG_FORMATS:
        raise ValueError(f"unrecognized MP4 sample entry {fmt!r}")

    z0, _ = boxes[b"stsz"]
    sample_size, count = struct.unpack(">II", payload[z0 + 4 : z0 + 12])
    if sample_size:
        sizes = [sample_size] * count
    else:
        sizes = list(
            struct.unpack(f">{count}I", payload[z0 + 12 : z0 + 12 + 4 * count])
        )
    if b"stco" in boxes:
        c0, _ = boxes[b"stco"]
        (n_chunks,) = struct.unpack(">I", payload[c0 + 4 : c0 + 8])
        offsets = list(
            struct.unpack(f">{n_chunks}I", payload[c0 + 8 : c0 + 8 + 4 * n_chunks])
        )
    else:  # co64
        c0, _ = boxes[b"co64"]
        (n_chunks,) = struct.unpack(">I", payload[c0 + 4 : c0 + 8])
        offsets = list(
            struct.unpack(f">{n_chunks}Q", payload[c0 + 8 : c0 + 8 + 8 * n_chunks])
        )
    sc0, _ = boxes[b"stsc"]
    (n_ent,) = struct.unpack(">I", payload[sc0 + 4 : sc0 + 8])
    stsc = [
        struct.unpack(">III", payload[sc0 + 8 + 12 * i : sc0 + 20 + 12 * i])
        for i in range(n_ent)
    ]

    delta = sample_delta(payload, boxes)

    # general sample→chunk walk: entry i applies to chunks
    # [first_chunk_i, first_chunk_{i+1}); samples lie consecutively from
    # each chunk's stco offset
    frames: list[np.ndarray] = []
    si = 0
    for ei, (first_chunk, per_chunk, _desc) in enumerate(stsc):
        last_chunk = (
            stsc[ei + 1][0] - 1 if ei + 1 < len(stsc) else len(offsets)
        )
        for ch in range(first_chunk, last_chunk + 1):
            off = offsets[ch - 1]
            for _ in range(per_chunk):
                if si >= count:
                    break
                px = decode_jpeg(payload[off : off + sizes[si]])[0]
                if px.ndim == 2:
                    px = np.repeat(px[..., None], 3, axis=-1)
                frames.append(px)
                off += sizes[si]
                si += 1
    if not frames:
        raise ValueError("no video samples found in MP4 payload")
    meta = {
        "width": frames[0].shape[1],
        "height": frames[0].shape[0],
        "fps": timescale / delta,
        "n_frames": len(frames),
    }
    return frames, meta
