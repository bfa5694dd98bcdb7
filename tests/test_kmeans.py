"""Portable k-means (ext/kmeans.py) — what the exact-matched assignment
MEANS: it recovers planted cluster structure, it is the same arithmetic
as an independent pure-numpy mirror (the third-implementation check the
PQ tier uses), emptied clusters keep their centroids, and the guards
refuse malformed input loudly.
"""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_DIR


def _numpy_mirror(X: np.ndarray, k: int, rounds: int, q: int = 10**4):
    """Independent integer Lloyd's — same contract, no shared code path
    beyond the spec: floor(x·q+0.5), seed centroids = rows 0..k-1,
    integer L2 argmin with smallest-id ties, trunc-division means,
    empty clusters keep centroids."""

    def tdiv(a, b):
        qq = abs(a) // abs(b)
        return qq if (a < 0) == (b < 0) else -qq

    Xq = np.floor(X * q + 0.5).astype(np.int64)
    cents = [Xq[j].tolist() for j in range(k)]

    def assign():
        d = np.array(
            [((Xq - np.array(c, dtype=np.int64)) ** 2).sum(axis=1) for c in cents]
        )  # (k, n)
        return d.argmin(axis=0), d.min(axis=0)  # argmin takes FIRST min = smallest id

    for _ in range(rounds):
        cl, _ = assign()
        nxt = [list(c) for c in cents]
        for j in range(k):
            members = Xq[cl == j]
            if len(members):
                s = members.sum(axis=0)
                nxt[j] = [tdiv(int(v), len(members)) for v in s]
        cents = nxt
    cl, d = assign()
    return cl, d


def test_kmeans_portable_matches_numpy_mirror_exactly(spark):
    from mesin_spark.ext.kmeans import kmeans_portable_assign
    from mesin_spark.queries import T

    emb = T(spark, SF_DIR, "embeddings")
    rows = emb.orderBy("vec_id").collect()
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    ids = [r["vec_id"] for r in rows]
    got = {
        r["vec_id"]: (r["cluster"], r["dist_fp"])
        for r in kmeans_portable_assign(emb, k=8, rounds=3).collect()
    }
    cl, d = _numpy_mirror(X, k=8, rounds=3)
    for pos, vid in enumerate(ids):
        assert got[vid] == (cl[pos], int(d[pos])), (vid, got[vid], cl[pos], d[pos])
    # determinism across runs
    again = {
        r["vec_id"]: (r["cluster"], r["dist_fp"])
        for r in kmeans_portable_assign(emb, k=8, rounds=3).collect()
    }
    assert got == again


def test_kmeans_portable_recovers_planted_blobs(spark):
    """Three well-separated blobs, seeds deliberately placed so that ids
    0..2 land one in each blob: after 3 rounds every member must sit in
    its blob-mate's cluster and blobs never merge."""
    rng = np.random.default_rng(11)
    centers = np.zeros((3, 64))
    centers[0, 0], centers[1, 1], centers[2, 2] = 0.5, 0.5, 0.5
    rows = []
    vid = 0
    for b in range(3):  # ids 0,1,2 are the first member of each blob
        rows.append((vid, [float(x) for x in centers[b]]))
        vid += 1
    for b in range(3):
        for _ in range(20):
            rows.append(
                (vid, [float(x) for x in centers[b] + rng.normal(0, 0.02, 64)])
            )
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from mesin_spark.ext.kmeans import kmeans_portable_assign

    got = {r["vec_id"]: r["cluster"] for r in
           kmeans_portable_assign(df, k=3, rounds=3).collect()}
    assert got[0] == 0 and got[1] == 1 and got[2] == 2  # seeds keep their ids
    for b in range(3):
        members = [got[3 + b * 20 + i] for i in range(20)]
        assert members == [b] * 20, (b, members)


def test_kmeans_portable_empty_cluster_and_guards(spark):
    """A seed that is a far outlier with no nearby mass keeps its
    centroid (never NaN/collapse); k without the seed rows and bad
    rounds raise loudly."""
    import pytest

    from mesin_spark.ext.kmeans import kmeans_portable_assign, kmeans_portable_train

    # two tight blobs + one isolated seed (id 2) that captures only
    # itself; after rounds its centroid must still be its own vector
    rows = [(0, [0.1] * 64), (1, [-0.1] * 64), (2, [0.9] * 64)]
    rows += [(10 + i, [0.1 + 0.001 * (i % 3)] * 64) for i in range(10)]
    rows += [(30 + i, [-0.1 - 0.001 * (i % 3)] * 64) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_portable_train(df, k=3, rounds=2)
    assert cents[2] == [9000] * 64  # floor(0.9*1e4+0.5): kept, not averaged away
    got = {r["vec_id"]: r["cluster"] for r in
           kmeans_portable_assign(df, k=3, rounds=2).collect()}
    assert got[2] == 2 and {got[10 + i] for i in range(10)} == {0}
    assert {got[30 + i] for i in range(10)} == {1}

    with pytest.raises(ValueError, match="seed centroids"):
        kmeans_portable_train(df.filter("vec_id >= 2"), k=3, rounds=1)
    with pytest.raises(ValueError, match="k >= 1 and rounds >= 0"):
        kmeans_portable_train(df, k=0, rounds=1)
