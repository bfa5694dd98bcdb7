"""Minimal AVI/MJPEG container codec (Microsoft RIFF-AVI, public spec) —
stdlib + numpy only.

Motion-JPEG in an AVI container is the simplest REAL video format: each
frame is an independent baseline JPEG (ext/jpeg.py) inside a RIFF chunk
stream, so a pure-Python pipeline can both produce files standard tools
play and ingest files they produce — upgrading the video tier beyond the
repo-invented MPPM stand-in. mp4/h264 stays a NotImplementedError stub
(inter-frame codecs genuinely need native libraries).

Writer emits: RIFF('AVI ') → LIST hdrl (avih + one LIST strl with
strh 'vids'/'MJPG' + strf BITMAPINFOHEADER) → LIST movi ('00dc' chunks,
word-aligned) → idx1. Reader walks the chunk tree and decodes every
'00dc'/'00db' frame with the baseline JPEG decoder; it accepts any
MJPEG-in-AVI within that decoder's envelope (baseline sequential, any
sampling layout, grayscale or color — grayscale frames broadcast to
(h, w, 3) to keep decode_video's contract) and raises cleanly
otherwise. Codec identity is validated on strf's biCompression (the
authoritative field), not strh's advisory fccHandler.
"""

from __future__ import annotations

import struct

import numpy as np

from mesin_spark.ext.jpeg import decode_jpeg, make_jpeg_payload


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(fourcc: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + body)


def make_avi_payload(
    frames: list[np.ndarray], fps: int = 10, quality: int = 85
) -> bytes:
    """Encode (h, w, 3) uint8 frames as an AVI/MJPEG file. All frames
    must share one size (the container declares a single geometry)."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one (h, w)")
    jpegs = [make_jpeg_payload(f, quality=quality) for f in frames]
    max_len = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,   # microseconds per frame
        0,                  # max bytes/sec (unset)
        0,                  # padding granularity
        0x10,               # flags: AVIF_HASINDEX
        len(jpegs),         # total frames
        0,                  # initial frames
        1,                  # streams
        max_len,            # suggested buffer size
        w, h, 0, 0, 0, 0,   # width, height, reserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG",
        0,                  # flags
        0, 0,               # priority, language
        0,                  # initial frames
        1, fps,             # scale, rate → fps frames/sec
        0, len(jpegs),      # start, length (frames)
        max_len,            # suggested buffer size
        0xFFFFFFFF,         # quality (default)
        0,                  # sample size
        0, 0, w, h,         # rcFrame (left, top, right, bottom)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks, idx, offset = [], [], 4  # offset counts from 'movi' fourcc
    for j in jpegs:
        ck = _chunk(b"00dc", j)
        movi_chunks.append(ck)
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, offset, len(j)))
        offset += len(ck)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(payload: bytes) -> tuple[list[np.ndarray], dict]:
    """Decode an AVI/MJPEG payload to (frames, meta) by walking the RIFF
    chunk tree; every '00dc'/'00db' chunk is decoded as a baseline JPEG.
    meta carries width/height/fps/n_frames from the headers."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    meta = {"width": 0, "height": 0, "fps": 0.0, "n_frames": 0}
    frames: list[np.ndarray] = []
    # strh chunks appear in stream order (stream N's strl is the Nth),
    # so the VIDEO stream's chunk id is '{N:02d}dc' for the N at which the
    # 'vids' strh appears — real capture files often list audio first,
    # making the video stream 1, not 0
    state = {"stream_type": b"", "strh_count": 0, "video_idx": None}

    def walk(buf: bytes, pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_at = pos + 8
            if fourcc == b"LIST":
                walk(buf, body_at + 4, body_at + size)
            elif fourcc == b"avih":
                us_pf, nframes = struct.unpack_from("<I", buf, body_at)[0], struct.unpack_from("<I", buf, body_at + 16)[0]
                meta["fps"] = (1_000_000 / us_pf) if us_pf else 0.0
                meta["n_frames"] = nframes
                meta["width"], meta["height"] = struct.unpack_from(
                    "<II", buf, body_at + 32
                )
            elif fourcc == b"strh":
                # remember the stream type; codec validation happens on
                # strf's biCompression (the strh fccHandler is advisory —
                # real MJPEG files carry null/'dmb1'/other handlers)
                state["stream_type"] = buf[body_at : body_at + 4]
                if state["stream_type"] == b"vids" and state["video_idx"] is None:
                    state["video_idx"] = state["strh_count"]
                state["strh_count"] += 1
            elif fourcc == b"strf" and state["stream_type"] == b"vids":
                # BITMAPINFOHEADER.biCompression at offset 16 is the
                # authoritative video codec id
                compression = buf[body_at + 16 : body_at + 20]
                if compression not in (
                    b"MJPG", b"mjpg", b"dmb1", b"\x00\x00\x00\x00"
                ):
                    raise NotImplementedError(
                        f"AVI video codec {compression!r} — only MJPG is "
                        "supported"
                    )
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                stream_no = int(fourcc[:2])
                want = state["video_idx"] if state["video_idx"] is not None else 0
                # size-0 chunks are dropped-frame padding in real capture
                # files — skip, don't feed the JPEG decoder an empty buffer
                if stream_no == want and size > 0:
                    px = decode_jpeg(buf[body_at : body_at + size])[0]
                    if px.ndim == 2:
                        # decode_video's contract is (h, w, 3) uint8 frames —
                        # broadcast grayscale MJPEG, else make_ppm_payload
                        # downstream emits a corrupt P6 body
                        px = np.repeat(px[..., None], 3, axis=-1)
                    frames.append(px)
            pos = body_at + size + (size & 1)

    walk(payload, 12, len(payload))
    if not frames:
        raise ValueError("no video frames found in AVI stream")
    return frames, meta
