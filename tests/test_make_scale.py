"""Property tests for tools/make_scale's per-shard content transforms —
the three anti-near-dup-forest guarantees every 100x probe measurement
stands on. A transform bug here silently corrupts every scale slope the
judge reads, so the invariants are pinned:

- part tags: pairwise Levenshtein >= 3 over ALL shard pairs (> the k=2
  fuzzy-join radius) and within-shard distances exactly preserved;
- embeddings: the shift+sign transform is ORTHOGONAL — norms and
  within-shard cosines preserved exactly, cross-shard identical-vector
  cosine scrambled away from 1.0;
- documents: all 100 letter-rotation transforms distinct on real text.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.make_scale import _rot, _rot2, _ROT_SRC, part_tag, shard_transform


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_part_tags_pairwise_distance_exceeds_join_radius():
    tags = [part_tag(i) for i in range(100)]
    assert len(set(tags)) == 100
    worst = min(
        _lev(tags[i], tags[j]) for i in range(100) for j in range(i + 1, 100)
    )
    assert worst >= 3, worst  # strictly outside the k=2 fuzzy-join radius
    # same-shard suffixes cancel: within-shard distances preserved exactly
    assert _lev("hot bolt" + tags[7], "hot colt" + tags[7]) == _lev(
        "hot bolt", "hot colt"
    )


def test_document_rotations_all_distinct():
    text = "the rain in spain stays mainly on the plain"
    seen = set()
    for i in range(100):
        t = text.translate(str.maketrans(_ROT_SRC, _rot(i)))
        if i >= len(_ROT_SRC):
            t = t.translate(str.maketrans("dcumfpgwyb", _rot2(i)))
        seen.add(t)
    assert len(seen) == 100


@pytest.mark.slow
def test_embedding_transform_is_orthogonal(spark):
    """Norms and within-shard cosines must be preserved EXACTLY (the
    shift is a permutation, the sign pattern a diagonal ±1 — both
    orthogonal); identical vectors in different shards must not stay
    cosine-1.0 twins."""
    import math

    from pyspark.sql import functions as F

    vecs = [
        [float((i * 7 + d * 3) % 11 - 5) for d in range(64)] for i in range(6)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )

    def collect_shard(i):
        out = shard_transform(df, "embeddings", i).orderBy("vec_id").collect()
        return [list(map(float, r["embedding"])) for r in out]

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.hypot(*a) * math.hypot(*b))

    base = collect_shard(0)
    for shard in (1, 37, 64, 93):
        t = collect_shard(shard)
        for v0, v1 in zip(base, t):
            assert abs(math.hypot(*v0) - math.hypot(*v1)) < 1e-9  # norm kept
        # within-shard cosines preserved exactly (orthogonality)
        for i in range(len(vecs)):
            for j in range(i + 1, len(vecs)):
                assert abs(cos(t[i], t[j]) - cos(base[i], base[j])) < 1e-9
        # the cross-shard twin is scrambled away from cosine 1.0
        for i in range(len(vecs)):
            assert cos(base[i], t[i]) < 0.99
    # distinct transforms for every shard pair sharing a shift (i, i+64)
    t0, t64 = collect_shard(5), collect_shard(69)
    assert all(cos(a, b) < 0.99 for a, b in zip(t0, t64))
