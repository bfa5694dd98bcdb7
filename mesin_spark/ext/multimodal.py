"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched pandas functions via
mapInPandas.

The container has no image/audio codecs, so the actual decode step is
STUBBED (clearly-marked NotImplementedError for real media formats; a
deterministic fake for 'txt' payloads) — but the Spark-side plumbing is
real and tested: schema (binary + metadata struct), partition-preserving
mapInPandas with Arrow batches, bounded batch memory via
spark.sql.execution.arrow.maxRecordsPerBatch.

At 100 TB the shape matters more than the codec: media blobs stay in
binary columns next to their metadata (one scan, no sidecar fetch), decode
runs in mapInPandas (per-partition, Arrow-batched, no shuffle), and derived
features land in typed columns for downstream SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUPPORTED_FAKE_FORMAT = "txt"

FEATURE_SCHEMA = (
    "doc_id long, format string, n_bytes long, checksum long, feature_mean double"
)


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a multimodal-shaped frame from the documents table: an opaque
    ``payload`` binary column plus a ``media`` metadata struct — the same
    schema an image/audio ingest would produce."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(SUPPORTED_FAKE_FORMAT).alias("format"),
            F.octet_length(payload).alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("double").alias("duration_s"),
        ).alias("media"),
    )


def _decode_payload(fmt: str, payload: bytes) -> bytes:
    """STUB: real media decode. Only the deterministic 'txt' fake is
    implemented in this container (no PIL/ffmpeg/librosa available)."""
    if fmt == SUPPORTED_FAKE_FORMAT:
        return payload
    raise NotImplementedError(
        f"decode for format {fmt!r} requires a media codec (PIL/ffmpeg) "
        "not present in this environment — plug one in here"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (payload, media) — Arrow batches
    in, typed feature columns out. checksum = sum of payload bytes mod 2^31
    (deterministic fake for an embedding); feature_mean = mean byte value."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fmts = pdf["media"].map(lambda m: m["format"])
            decoded = [
                _decode_payload(fmt, bytes(pl)) for fmt, pl in zip(fmts, pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": fmts,
                    "n_bytes": [len(d) for d in decoded],
                    "checksum": [sum(d) % (1 << 31) for d in decoded],
                    "feature_mean": [
                        (sum(d) / len(d)) if len(d) else 0.0 for d in decoded
                    ],
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """STUB: video frame sampling — requires a video codec. The Spark-side
    contract (binary in, array-of-binary frames out via mapInPandas) is the
    documented shape; raises until a codec is plugged in."""
    raise NotImplementedError(
        "frame_sample requires ffmpeg/pyav (absent in this container); "
        "implement as mapInPandas over payload returning array<binary> frames"
    )


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB: image resize — requires PIL. Same mapInPandas contract."""
    raise NotImplementedError(
        "resize_images requires PIL (absent in this container); "
        "implement as mapInPandas over payload returning resized binary"
    )
