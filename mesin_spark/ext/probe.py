"""Media probing: container/codec metadata WITHOUT decoding — the
ffprobe-style ingest step a 100 TB corpus runs before deciding what to
decode (route by kind, drop broken payloads, budget decode work by
resolution/duration).

Each prober reads only headers/tables:
- JPEG: marker walk to SOF — dimensions, component count, and whether
  the file is baseline (SOF0) or progressive (SOF2); no entropy decode.
- PPM / MPPM: header arithmetic — frame sizes let the walk skip pixel
  data without touching it.
- WAV: fmt + data chunk sizes — sample rate, channels, duration.
- AVI: avih/strh/strf headers — geometry, fps, frame count, codec id.
- MP4: box walk (moov only) — geometry, timescale/fps, sample count,
  codec fourcc; the mdat samples are never read.

The Spark operator wraps the prober in the same per-record poison-pill
guard as the decode tier (ext/multimodal.py): a malformed payload flags
its row via the ``error`` column, never the job.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def probe_jpeg(payload: bytes) -> dict:
    """Marker walk to the SOF segment — no entropy decode."""
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9 or marker == 0xDA:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                      0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            h, w = struct.unpack(">HH", payload[pos + 3 : pos + 7])
            nc = payload[pos + 7]
            codec = {0xC0: "jpeg-baseline", 0xC2: "jpeg-progressive"}.get(
                marker, f"jpeg-sof{marker - 0xC0:x}"
            )
            return {
                "kind": "image",
                "codec": codec,
                "width": w,
                "height": h,
                "n_channels": nc,
            }
        pos += seglen
    raise ValueError("no SOF segment found in JPEG stream")


def probe_wav(payload: bytes) -> dict:
    """RIFF header walk — fmt + data sizes only."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    rate = channels = bits = data_len = 0
    while pos + 8 <= n:
        cid, csize = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        if cid == b"fmt ":
            _, channels, rate = struct.unpack("<HHI", payload[pos + 8 : pos + 16])
            bits = struct.unpack("<H", payload[pos + 22 : pos + 24])[0]
        elif cid == b"data":
            data_len = csize
        pos += 8 + csize + (csize & 1)
    n_samples = data_len // max((bits // 8) * max(channels, 1), 1)
    return {
        "kind": "audio",
        "codec": "pcm",
        "sample_rate": rate,
        "n_channels": channels,
        "duration_s": (n_samples / rate) if rate else 0.0,
    }


def probe_ppm(payload: bytes) -> dict:
    # header arithmetic only: each frame's pixel span is computed from
    # its header, so the walk never reads the pixels
    n_frames = 0
    pos = 0
    w = h = 0
    while pos < len(payload):
        _, meta, end = _probe_ppm_header(payload, pos)
        if n_frames == 0:
            w, h = meta["width"], meta["height"]
        n_frames += 1
        pos = end
    if n_frames == 1:
        return {"kind": "image", "codec": "ppm", "width": w, "height": h,
                "n_channels": 3}
    return {"kind": "video", "codec": "mppm", "width": w, "height": h,
            "n_frames": n_frames}


def _probe_ppm_header(payload: bytes, pos: int):
    """P6 header parse without materializing pixels (mirrors
    multimodal._parse_ppm_at's header walk; the pixel slice is skipped
    by arithmetic)."""
    if payload[pos : pos + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    pos += 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1
    w, h, _maxval = fields
    return None, {"width": w, "height": h}, pos + w * h * 3


def probe_avi(payload: bytes) -> dict:
    """avih/strf header read — no frame chunk is touched."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    out = {"kind": "video", "codec": "", "width": 0, "height": 0,
           "fps": 0.0, "n_frames": 0}
    state = {"stream_type": b""}

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = pos + 8
            if fourcc == b"LIST":
                lk = payload[body : body + 4]
                if lk != b"movi":  # never descend into frame data
                    walk(body + 4, body + size)
            elif fourcc == b"avih":
                us_pf = struct.unpack_from("<I", payload, body)[0]
                out["fps"] = (1_000_000 / us_pf) if us_pf else 0.0
                out["n_frames"] = struct.unpack_from("<I", payload, body + 16)[0]
                out["width"], out["height"] = struct.unpack_from(
                    "<II", payload, body + 32
                )
            elif fourcc == b"strh":
                state["stream_type"] = payload[body : body + 4]
            elif fourcc == b"strf" and state["stream_type"] == b"vids":
                out["codec"] = (
                    payload[body + 16 : body + 20].decode(errors="replace").strip("\x00")
                    or "raw"
                )
            pos = body + size + (size & 1)

    walk(12, len(payload))
    return out


def probe_mp4(payload: bytes) -> dict:
    """moov box walk — geometry, fps, sample count, codec fourcc; the
    mdat samples are never read. Track discovery and the stts delta are
    mp4.video_track_tables / mp4.sample_delta — the SAME code the real
    decoder runs, so prober and reader cannot silently diverge on hdlr/
    mdhd/stbl interpretation."""
    from mesin_spark.ext import mp4 as M4

    boxes, timescale = M4.video_track_tables(payload)
    try:
        d0, d1 = boxes[b"stsd"]
        fmt, e0, _e1 = next(iter(M4._walk_boxes(payload, d0 + 8, d1)))
        w, h = struct.unpack(">HH", payload[e0 + 24 : e0 + 28])
        z0, _ = boxes[b"stsz"]
        count = struct.unpack(">I", payload[z0 + 8 : z0 + 12])[0]
    except (KeyError, StopIteration) as e:
        raise ValueError(
            "MP4 video track is missing its sample tables (stsd/stsz)"
        ) from e
    return {
        "kind": "video",
        "codec": fmt.decode(errors="replace").strip(),
        "width": w,
        "height": h,
        "fps": timescale / M4.sample_delta(payload, boxes),
        "n_frames": count,
    }


def probe_media(payload: bytes) -> dict:
    """Sniff the container by magic bytes and return its header metadata
    — the one entry point. Raises ValueError on unrecognized bytes (the
    Spark operator converts that to a flagged row)."""
    if payload[:2] == b"\xff\xd8":
        return probe_jpeg(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return probe_wav(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return probe_avi(payload)
    if payload[4:8] in (b"ftyp", b"moov"):
        return probe_mp4(payload)
    if payload[:2] == b"P6":
        return probe_ppm(payload)
    raise ValueError("unrecognized media payload (no known magic bytes)")


PROBE_SCHEMA = (
    "doc_id long, kind string, codec string, width int, height int, "
    "n_channels int, n_frames int, fps double, sample_rate int, "
    "duration_s double, n_bytes long, error string"
)

_PROBE_COLS = (
    "kind", "codec", "width", "height", "n_channels", "n_frames", "fps",
    "sample_rate", "duration_s",
)


def probe_media_features(df: DataFrame) -> DataFrame:
    """mapInPandas media probe over (doc_id, payload): container/codec
    metadata per payload WITHOUT decoding — headers and sample tables
    only, so probing a corpus costs I/O + microseconds per record, not
    decode time. Per-record poison-pill guard like the decode tier."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mesin_spark.ext.multimodal import _err

        for pdf in it:
            cols: dict[str, list] = {c: [] for c in _PROBE_COLS}
            n_bytes, errs = [], []
            for pl in pdf["payload"]:
                raw = bytes(pl)
                n_bytes.append(len(raw))
                try:
                    meta = probe_media(raw)
                    for c in _PROBE_COLS:
                        cols[c].append(meta.get(c))
                    errs.append(None)
                except Exception as e:  # per-record poison-pill isolation
                    for c in _PROBE_COLS:
                        cols[c].append(None)
                    errs.append(_err(e))
            out = {"doc_id": pdf["doc_id"]}
            out.update({c: pd.array(v, dtype=object) for c, v in cols.items()})
            out["n_bytes"] = pd.array(n_bytes, dtype=object)
            out["error"] = pd.array(errs, dtype=object)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=PROBE_SCHEMA)
