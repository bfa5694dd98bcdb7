"""Content-defined chunking (ext/cdc.py): boundary determinism and
bounds, the shift-resilience property that distinguishes CDC from
fixed-width chunking, the Spark operator's per-record poison guard, and
q_cdc_dedup's planted shifted-twin recovery."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_DIR


def test_cdc_boundaries_deterministic_and_bounded():
    from mesin_spark.ext.cdc import chunk_boundaries

    rng = np.random.default_rng(1)
    data = bytes(rng.integers(0, 256, 8000, dtype=np.uint8))
    ends = chunk_boundaries(data, avg_size=256, min_size=64, max_size=1024)
    assert ends == chunk_boundaries(data, avg_size=256, min_size=64, max_size=1024)
    assert ends[-1] == len(data)
    lens = np.diff([0] + ends)
    assert lens.min() >= 1 and lens.max() <= 1024
    # all but the final tail respect min_size
    assert (lens[:-1] >= 64).all()
    # avg in the right ballpark (mask-driven)
    assert 100 <= lens.mean() <= 600
    # degenerate inputs
    assert chunk_boundaries(b"") == []
    assert chunk_boundaries(b"tiny") == [4]


def test_cdc_shift_resilience_vs_fixed_width():
    """THE property: a 7-byte prepend or a mid-stream edit preserves the
    vast majority of CDC chunk hashes, while fixed-width chunking keeps
    none — boundaries derive from content, not offsets."""
    from mesin_spark.ext.cdc import cdc_chunks

    rng = np.random.default_rng(1)
    data = bytes(rng.integers(0, 256, 8000, dtype=np.uint8))
    c1 = {h for _, _, h in cdc_chunks(data)}
    c2 = {h for _, _, h in cdc_chunks(b"PREFIX-" + data)}
    assert len(c1 & c2) / len(c1) > 0.9
    c3 = {h for _, _, h in cdc_chunks(data[:4000] + b"XYZ" + data[4000:])}
    assert len(c1 & c3) / len(c1) > 0.9
    # fixed-width contrast: zero shared blocks after the shift
    fw1 = {bytes(data[i : i + 256]) for i in range(0, len(data), 256)}
    fw2 = {bytes((b"PREFIX-" + data)[i : i + 256]) for i in range(0, len(data) + 7, 256)}
    assert len(fw1 & fw2) == 0


def test_cdc_spark_operator_and_poison(spark):
    from mesin_spark.ext.cdc import cdc_chunks, chunk_payloads

    rng = np.random.default_rng(2)
    good = bytes(rng.integers(0, 256, 3000, dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, bytearray(good))], "doc_id long, payload binary"
    )
    rows = chunk_payloads(df).collect()
    ref = cdc_chunks(good)
    assert [(r.chunk_off, r.chunk_len, r.chunk_hash) for r in rows] == ref
    assert all(r.error is None for r in rows)

    # poison: avg_size must be a power of two — per-record flag, not a crash
    bad = chunk_payloads(df, avg_size=300).collect()
    assert len(bad) == 1 and bad[0].error is not None and bad[0].chunk_hash is None


def test_q_cdc_dedup_recovers_shifted_twins(spark):
    import __spark_entry__ as E

    rows = E.queries()["q_cdc_dedup"](spark, SF_DIR).collect()
    assert len(rows) == 150
    fr = [r.shared_frac for r in rows]
    assert sum(fr) / len(fr) > 0.75  # most chunks survive the prefix shift
    assert min(fr) > 0.3
    assert all(r.n_shared <= r.n_chunks for r in rows)
