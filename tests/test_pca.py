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


def test_pca_portable_direction_matches_numpy_pc1(spark):
    """What the q_pca_portable direction MEANS, in two prongs matched to
    what each corpus can support. (1) On a crafted corpus with a real
    spectral gap (dim 0 planted at 10x the variance), 16 integer rounds
    must land on numpy eigh's true PC1 at cosine >= 0.999, with the
    canonical sign making the +dim0 extreme row's score positive and
    maximal. (2) On the synthetic fixture the top eigenvalues are
    near-degenerate (lambda2/lambda1 = 0.93 — no few-round method can
    single out PC1 there, and no variance-motivated user needs it to),
    so the pinned property is the Rayleigh quotient: the integer
    direction captures >= 0.9 of lambda1's variance. Plus determinism
    across runs."""
    from mesin_spark.ext.pca import covariance_stats, pca_portable_pc1
    from mesin_spark.queries import T

    # (1) crafted gap corpus: exact PC1 tie
    rng = np.random.default_rng(7)
    base = rng.normal(0, 0.01, (40, 64))
    base[:, 0] = rng.normal(0, 0.10, 40)  # dominant direction = dim 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    mean_c, cov_c, _ = covariance_stats(df)
    pc1_c = np.linalg.eigh(cov_c)[1][:, -1]
    out = {r["vec_id"]: r["pc1_fp"] for r in pca_portable_pc1(df, rounds=16).collect()}
    scores_c = np.array([float(out[i]) for i in range(40)])
    ref_c = (base - mean_c) @ pc1_c
    cos = abs(np.dot(scores_c, ref_c)) / (
        np.linalg.norm(scores_c) * np.linalg.norm(ref_c)
    )
    assert cos >= 0.999, cos
    # canonical sign: the row with the largest +dim0 value scores max
    imax, imin = int(np.argmax(base[:, 0])), int(np.argmin(base[:, 0]))
    assert out[imax] == max(out.values()) and out[imin] == min(out.values())
    assert out[imax] > 0 > out[imin]

    # (2) fixture: determinism + Rayleigh quotient vs lambda1
    emb = T(spark, SF_DIR, "embeddings")
    got = pca_portable_pc1(emb, rounds=16).orderBy("vec_id").collect()
    again = pca_portable_pc1(emb, rounds=16).orderBy("vec_id").collect()
    assert got == again
    mean, cov, n = covariance_stats(emb)
    lam1 = np.linalg.eigvalsh(cov)[-1]
    X = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in
         emb.orderBy("vec_id").collect()]
    )
    # recover the direction from the integer scores: scores ~ (X-mean)@v
    # up to scale, so regress — or equivalently measure the variance the
    # score axis captures: var(score)/|v|^2 ... simplest exact route:
    # rebuild v by rerunning the driver-side iteration via the public fn
    # on a 1-row projection is overkill; use the score vector itself:
    # Rayleigh(v) = var(scores) / (v'v) — instead compare captured
    # variance through the unit-normalized score loadings.
    s = np.array([float(r["pc1_fp"]) for r in got])
    # project X onto the score-defined axis: the score IS c*(X-mean)@v,
    # so var(s) = c^2 * v'Cov v and the unit-direction Rayleigh quotient
    # is var(s) / (c^2 |v|^2); eliminate c|v| via the regression of s on
    # (X-mean): beta = argmin |(X-mean)b - s| recovers b ∝ v
    b, *_ = np.linalg.lstsq(X - mean, s, rcond=None)
    ray = (b @ cov @ b) / (b @ b)
    assert ray >= 0.9 * lam1, (ray, lam1)


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
