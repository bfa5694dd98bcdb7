"""Content-defined chunking (CDC) dedup for binary payloads — the
storage-level dedup primitive (restic/borg/LBFS lineage, public
literature) that text-level operators can't replace: chunk boundaries
are chosen where a rolling hash of the CONTENT hits a mask, so
inserting or deleting bytes shifts only the chunks that actually
changed — a fixed-width chunker loses every boundary after the edit
point and finds ~zero sharing between near-identical blobs.

Rolling hash: 64-bit buzhash (cyclic polynomial) over a w-byte window,
h_i = XOR_{k=0..w-1} rotl64(T[b_{i-k}], k) with a deterministic seeded
byte table T — the closed form lets numpy compute every position's hash
as w vectorized rotate/XOR passes instead of a per-byte Python loop.
A position ends a chunk when (h & mask) == 0 (mask = avg_size - 1,
power of two), subject to min/max chunk bounds enforced in a scan over
the (few) candidate positions only.

Spark shape: chunking is per-payload numpy inside mapInPandas
(Arrow-batched, no shuffle — the justified-Python codec case); the only
shuffle downstream is the groupBy on the 64-bit chunk hash, exactly the
image-dedup plan. At 100 TB the chunk table is the dedup index: shared
bytes are found without any pairwise comparison.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

__all__ = ["chunk_boundaries", "cdc_chunks", "chunk_payloads"]

_W = 16  # rolling window bytes

#: deterministic 256-entry uint64 byte table (seeded — portable run-to-run)
_T = np.random.default_rng(0x5EED_CDC).integers(
    0, 1 << 63, size=256, dtype=np.int64
).astype(np.uint64)


def _rotl64(x: np.ndarray, k: int) -> np.ndarray:
    k &= 63
    if k == 0:
        return x
    return (x << np.uint64(k)) | (x >> np.uint64(64 - k))


def chunk_boundaries(
    payload: bytes, avg_size: int = 256, min_size: int = 64, max_size: int = 1024
) -> list[int]:
    """End offsets (exclusive) of each chunk. avg_size must be a power of
    two; boundaries land where the buzhash of the trailing window has its
    low log2(avg_size) bits zero, with min/max bounds enforced."""
    if avg_size & (avg_size - 1):
        raise ValueError(f"avg_size must be a power of two, got {avg_size}")
    n = len(payload)
    if n == 0:
        return []
    if n <= min_size:
        return [n]
    b = np.frombuffer(payload, dtype=np.uint8)
    tv = _T[b]
    # h[i] = XOR_k rotl(T[b[i-k]], k) for i >= w-1: w shifted rotate/XOR passes
    h = _rotl64(tv[_W - 1 :], 0).copy()
    for k in range(1, _W):
        h ^= _rotl64(tv[_W - 1 - k : n - k], k)
    mask = np.uint64(avg_size - 1)
    # candidate boundary AFTER byte i (position i+1), i aligned to h index
    cand = np.nonzero((h & mask) == 0)[0] + _W  # end offsets
    ends: list[int] = []
    start = 0
    for c in cand:
        c = int(c)
        if c - start < min_size:
            continue
        while c - start > max_size:  # forced cut inside an over-long run
            ends.append(start + max_size)
            start += max_size
        if c - start >= min_size:
            ends.append(c)
            start = c
    while n - start > max_size:
        ends.append(start + max_size)
        start += max_size
    if start < n:
        ends.append(n)
    return ends


def cdc_chunks(
    payload: bytes, avg_size: int = 256, min_size: int = 64, max_size: int = 1024
) -> list[tuple[int, int, int]]:
    """(offset, length, chunk_hash) per chunk; the hash is FNV-1a 64 over
    the chunk bytes (deterministic, signed-long-safe for Spark)."""
    out = []
    start = 0
    mask = (1 << 64) - 1
    prime = 0x100000001B3
    for end in chunk_boundaries(payload, avg_size, min_size, max_size):
        # plain-int FNV-1a with an explicit 2^64 mask: numpy uint64
        # SCALARS pay ~10x per-op overhead, and this inner loop touches
        # every payload byte — the vectorized rolling hash above would
        # otherwise be dominated by the chunk-hash pass. Same values
        # bit-for-bit (FNV is modular arithmetic either way).
        h = 0xCBF29CE484222325
        for byte in payload[start:end]:
            h = ((h ^ byte) * prime) & mask
        out.append((start, end - start, h - (1 << 64) if h >= 1 << 63 else h))
        start = end
    return out


CHUNK_SCHEMA = (
    "doc_id long, chunk_idx int, chunk_off int, chunk_len int, "
    "chunk_hash long, error string"
)


def chunk_payloads(
    df: DataFrame,
    avg_size: int = 256,
    min_size: int = 64,
    max_size: int = 1024,
    payload_col: str = "payload",
) -> DataFrame:
    """mapInPandas CDC chunker over (doc_id, payload) → one row per
    chunk. Per-record poison-pill guard like the codec tier; downstream
    dedup is ``groupBy(chunk_hash)`` — the only shuffle."""

    def batches(it):
        import pandas as pd

        from mesin_spark.ext.multimodal import _err

        for pdf in it:
            ids, idxs, offs, lens, hashes, errs = [], [], [], [], [], []
            for did, pl in zip(pdf["doc_id"], pdf[payload_col]):
                try:
                    chunks = cdc_chunks(bytes(pl), avg_size, min_size, max_size)
                    for i, (off, ln, hv) in enumerate(chunks):
                        ids.append(did)
                        idxs.append(i)
                        offs.append(off)
                        lens.append(ln)
                        hashes.append(hv)
                        errs.append(None)
                except Exception as e:  # per-record poison-pill isolation
                    ids.append(did)
                    idxs.append(None)
                    offs.append(None)
                    lens.append(None)
                    hashes.append(None)
                    errs.append(_err(e))
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype=object),
                    "chunk_idx": pd.array(idxs, dtype=object),
                    "chunk_off": pd.array(offs, dtype=object),
                    "chunk_len": pd.array(lens, dtype=object),
                    "chunk_hash": pd.array(hashes, dtype=object),
                    "error": pd.array(errs, dtype=object),
                }
            )

    return df.mapInPandas(batches, schema=CHUNK_SCHEMA)
