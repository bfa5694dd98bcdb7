"""PCA whitening for embedding columns — the standard preprocessing step
of embedding-dedup pipelines (SemDeDup-style corpora whiten before
cosine thresholds so no single dominant direction swamps similarity).

Scale shape: the d×d covariance is computed from per-partition partial
Gram matrices (Arrow-batched numpy in mapInPandas — one outer-product
accumulation per partition, the same justified-Python case as IVF
assignment; a JVM-expression variant was measured at 30s of codegen
compile for d=64's 2080 aggregate columns vs <1s here), each partial a
single (n, Σx, ΣxxT) row, summed driver-side — a bounded collect of one
row per partition. No sampling: the covariance is exact. The
eigendecomposition runs driver-side on the d×d result — metadata-sized
by construction — and the projection back over the corpus is a
literal-matrix codegen expression. Python never touches a data-sized
row set on the way out.

Eigenvector sign is canonicalized (largest-|component| entry positive)
so output is deterministic run-to-run and across partitionings.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mesin_spark.functions import stable_round as R

__all__ = ["covariance_stats", "pca_model", "pca_project"]


def covariance_stats(
    emb: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> tuple[np.ndarray, np.ndarray, int]:
    """(mean vector, covariance matrix, n) — exact, no sampling: each
    partition reduces to ONE (n, Σx, vec(ΣxxT)) partial row via numpy;
    the driver sums the per-partition partials (bounded collect)."""
    if dim is None:
        first = emb.select(vec_col).head()
        if first is None:
            # fall through to the deliberate n<2 message instead of dying
            # on None[0] while inferring the dimension of an empty frame
            raise ValueError("need >= 2 vectors for a covariance, got 0")
        dim = len(first[0])

    def partials(it):
        import pandas as pd

        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for pdf in it:
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
            ) if len(pdf) else np.zeros((0, dim))
            n += X.shape[0]
            if X.shape[0]:
                s += X.sum(axis=0)
                g += X.T @ X
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
        )

    rows = (
        emb.select(F.col(vec_col).alias("_v"))
        .mapInPandas(partials, "n long, s array<double>, g array<double>")
        .collect()
    )
    n = sum(r["n"] for r in rows)
    if n < 2:
        raise ValueError(f"need >= 2 vectors for a covariance, got {n}")
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(dim, dim) for r in rows], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    return mean, (cov + cov.T) / 2, n


def pca_model(
    emb: DataFrame,
    vec_col: str = "embedding",
    k: int = 4,
    whiten: bool = True,
    eps: float = 1e-9,
) -> dict:
    """Fit: top-k eigenpairs of the exact covariance. Returns
    {mean, components (k, d), eigvals (k,), whiten} with each component's
    sign canonicalized (entry of largest |value| made positive)."""
    mean, cov, n = covariance_stats(emb, vec_col)
    w, u = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    # eigh noise can return trailing eigenvalues slightly NEGATIVE on
    # rank-deficient data (|lambda| scales with ||cov||, easily past any
    # fixed eps) — clip at 0 so the whitening 1/sqrt(lambda + eps) stays
    # finite instead of producing an all-NaN component
    eigvals = np.maximum(w[order], 0.0)
    comps = u[:, order].T.copy()  # (k, d)
    for r in range(comps.shape[0]):
        pivot = int(np.argmax(np.abs(comps[r])))
        if comps[r, pivot] < 0:
            comps[r] = -comps[r]
    return {
        "mean": mean,
        "components": comps,
        "eigvals": eigvals,
        "whiten": whiten,
        "eps": eps,
        "n": n,
    }


def pca_project(
    emb: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Project (and optionally whiten) every vector with the fitted model
    as a pure literal-matrix codegen expression — no UDF, no shuffle:
    out_j = Σ_i (x_i - mean_i) · W_ji [/ sqrt(λ_j + eps)]. Returns
    (id, comp0..comp{k-1}) rounded."""
    comps, mean = model["components"], model["mean"]
    scale = (
        1.0 / np.sqrt(model["eigvals"] + model["eps"])
        if model["whiten"]
        else np.ones(len(model["eigvals"]))
    )
    v = lambda i: F.element_at(F.col(vec_col), i + 1).cast("double")  # noqa: E731
    cols = []
    for j in range(comps.shape[0]):
        expr = None
        for i in range(comps.shape[1]):
            term = (v(i) - F.lit(float(mean[i]))) * F.lit(float(comps[j, i]))
            expr = term if expr is None else expr + term
        cols.append(R(expr * F.lit(float(scale[j])), round_to).alias(f"comp{j}"))
    return emb.select(F.col(id_col), *cols)
