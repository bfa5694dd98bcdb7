"""PCA whitening invariants (ext/pca.py): whitened output has unit
variance per component and ~zero cross-correlation, components are
orthonormal and variance-ordered, the Spark projection agrees with a
pure-numpy reference to rounding precision, and label propagation's
fixed-round determinism (ext/graph.py) holds. Exact cross-engine checks
live in the oracle sweep (q_label_prop) and the rows-only registry run
(q_embed_pca)."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_DIR


def test_pca_whitening_invariants(spark):
    from mesin_spark.ext.pca import pca_model, pca_project
    from mesin_spark.queries import T

    emb = T(spark, SF_DIR, "embeddings")
    model = pca_model(emb, k=8, whiten=True)
    # eigenvalues descending, all positive on this fixture
    ev = model["eigvals"]
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))
    assert ev[-1] > 0
    # components orthonormal
    Ct = model["components"] @ model["components"].T
    assert np.abs(Ct - np.eye(len(ev))).max() < 1e-9
    # sign canonicalization: largest-|entry| positive per component
    for r in model["components"]:
        assert r[int(np.argmax(np.abs(r)))] > 0

    out = pca_project(emb, model, round_to=6).collect()
    X = np.array([[r[f"comp{j}"] for j in range(8)] for r in out])
    C = np.cov(X.T)
    # whitened: ~unit variance (n/(n-1) bias factor), ~uncorrelated
    assert np.abs(np.diag(C) - 1.0).max() < 0.05
    assert np.abs(C - np.diag(np.diag(C))).max() < 1e-4

    # agreement with a pure-numpy reference pipeline on the same rows
    rows = emb.select("vec_id", "embedding").collect()
    V = np.array([list(map(float, r.embedding)) for r in rows])
    mean = V.mean(axis=0)
    cov = np.cov(V.T, bias=True)
    w, u = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:8]
    comps = u[:, order].T.copy()
    for r_ in range(8):
        p = int(np.argmax(np.abs(comps[r_])))
        if comps[r_, p] < 0:
            comps[r_] = -comps[r_]
    ref = (V - mean) @ comps.T / np.sqrt(w[order] + 1e-9)
    got = {r.vec_id: np.array([r[f"comp{j}"] for j in range(8)]) for r in out}
    for k_, r in enumerate(rows):
        assert np.abs(got[r.vec_id] - ref[k_]).max() < 5e-6


def test_pca_deterministic_across_runs(spark):
    from mesin_spark.ext.pca import pca_model, pca_project
    from mesin_spark.queries import T

    emb = T(spark, SF_DIR, "embeddings")
    a = pca_project(emb, pca_model(emb, k=4), round_to=6).orderBy("vec_id").collect()
    b = pca_project(emb, pca_model(emb, k=4), round_to=6).orderBy("vec_id").collect()
    assert a == b


def test_label_propagation_crafted_communities(spark):
    """Two triangles joined by one bridge edge: after propagation each
    triangle converges to its own minimum label; fixed-round determinism
    and the tie-to-smallest rule are pinned on a crafted graph."""
    from mesin_spark.ext.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)],
        ["src", "dst"],
    )
    out = {r.node: r.label for r in label_propagation(edges, n_rounds=4).collect()}
    assert set(out) == {1, 2, 3, 10, 11, 12}
    # triangle {1,2,3} all share one label; {10,11,12} share another
    assert out[1] == out[2] == out[3] == 1
    assert out[10] == out[11] == out[12]
    assert out[10] != out[1]
    # deterministic
    again = {r.node: r.label for r in label_propagation(edges, n_rounds=4).collect()}
    assert out == again
