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

__all__ = [
    "covariance_stats",
    "pca_model",
    "pca_project",
    "gram_int",
    "pca_portable_pc1",
]


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


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — the shared semantics of
    Spark's `div` and DuckDB's `//` (both verified: -7/2 -> -3). Python's
    own // FLOORS (-7//2 -> -4), so the driver-side power iteration must
    not use it directly or the two engines diverge on the first negative
    intermediate."""
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


def gram_int(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    q_scale: int = 10**4,
) -> tuple[int, int, list[int], list[list[int]]]:
    """(n, max|xq|, Sx, Sxy) over the QUANTIZED vectors xq_i = floor(x_i*q_scale
    + 0.5) — all exact int64 sums, so the result is bit-identical in any
    engine and under any partitioning/summation order (integer addition
    is associative; the float covariance path can never promise that).
    Same scale shape as covariance_stats: one Arrow-batched partial row
    per partition, bounded driver collect, d×d work only on the driver.

    In-partition accumulation is numpy int64; with |xq| ≤ q_scale·max|x|
    the per-partition product sum stays exact up to ~2^63/(q_scale²·x²)
    rows — ~10^11 rows/partition at q_scale=10^4, x≤1 — far past any
    real partition size; the driver-side total uses Python ints (no
    wrap)."""

    def partials(it):
        import pandas as pd

        n = 0
        mx = 0
        s = np.zeros(dim, dtype=np.int64)
        g = np.zeros((dim, dim), dtype=np.int64)
        for pdf in it:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
            Xq = np.floor(X * q_scale + 0.5).astype(np.int64)
            n += Xq.shape[0]
            mx = max(mx, int(np.abs(Xq).max()))
            s += Xq.sum(axis=0)
            g += Xq.T @ Xq
        yield pd.DataFrame(
            {
                "n": [n],
                "mx": [mx],
                "s": [s.tolist()],
                "g": [g.reshape(-1).tolist()],
            }
        )

    rows = (
        emb.select(F.col(vec_col).alias("_v"))
        .mapInPandas(partials, "n long, mx long, s array<long>, g array<long>")
        .collect()
    )
    n = sum(int(r["n"]) for r in rows)
    if n < 2:
        raise ValueError(f"pca_portable: need >= 2 vectors, got {n}")
    mx = max((int(r["mx"]) for r in rows), default=0)
    sx = [sum(int(r["s"][i]) for r in rows) for i in range(dim)]
    sxy = [
        [sum(int(r["g"][i * dim + j]) for r in rows) for j in range(dim)]
        for i in range(dim)
    ]
    return n, mx, sx, sxy


def pca_portable_pc1(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    rounds: int = 8,
    q_scale: int = 10**4,
    g_div: int = 10**6,
    v_scale: int = 10**6,
) -> DataFrame:
    """Dominant principal-component score per vector in EXACT integer
    arithmetic — the portable-proof strategy (pagerank_portable,
    hits_portable) applied to the eigen-extraction that made q_embed_pca
    rows-only. Every step is reproducible bit-for-bit by an independent
    engine from the same stored rows:

    1. quantize: xq_i = floor(x_i · q_scale + 0.5) (floor is exact on
       IEEE doubles; float32 inputs widen exactly);
    2. centered integer Gram: G[j][i] = n·Σxq_j xq_i − Sx_j·Sx_i
       (= n²·cov of the quantized data — the scale factor is irrelevant
       to the eigenvector), downscaled G' = G div g_div to make room
       for the iteration products;
    3. ``rounds`` power-iteration steps v ← (G'·v) div (max|G'·v| div
       v_scale), all in truncating integer division (Spark `div` ==
       DuckDB `//`; Python's floor-div is deliberately avoided — see
       _tdiv), run DRIVER-side on the d×d matrix (metadata-sized, like
       eigh);
    4. sign canonicalization: the entry of largest |value| (smallest
       index on ties) is made positive;
    5. projection: pc1_fp = Σ_i (n·xq_i − Sx_i) · v_i — a literal-int
       codegen expression over the corpus, no UDF, no shuffle.

    Power iteration converges to the true PC1 direction at rate
    (λ2/λ1)^rounds; the pytest ties the integer vector to numpy eigh's
    eigenvector at cosine ≥ 0.999 on the fixture. Both engines run the
    SAME fixed round count, so cross-engine equality holds even where
    convergence is partial. Overflow is guarded with the actual bounds,
    not hope: every intermediate is checked against 2^63 on the driver
    and the matrix-vector product is sized |w| ≤ d·max|G'|·(2·v_scale).
    Returns (id, pc1_fp) — BIGINT, exact."""
    n, mx, sx, sxy = gram_int(emb, vec_col, dim, q_scale)
    lim = 2**63 - 1
    # the ORACLE engine computes n·Sxy and Sx·Sx in BIGINT — guard their
    # bounds here (Python ints would silently keep going)
    smax = max((abs(x) for row in sxy for x in row), default=0)
    sxmax = max((abs(x) for x in sx), default=0)
    if n * smax > lim or sxmax * sxmax > lim:
        raise ValueError(
            "pca_portable: raw Gram terms exceed int64 — lower q_scale "
            f"(n·max|Sxy|={n * smax}, max|Sx|²={sxmax * sxmax})"
        )
    g = [
        [_tdiv(n * sxy[j][i] - sx[j] * sx[i], g_div) for i in range(dim)]
        for j in range(dim)
    ]
    gmax = max((abs(x) for row in g for x in row), default=0)
    if gmax == 0:
        raise ValueError(
            "pca_portable: downscaled Gram is all-zero — raise g_div "
            "resolution (constant input or g_div too coarse)"
        )
    # |v| ≤ 2·v_scale after normalization (truncation slack), so the
    # worst matrix-vector term sum is d·gmax·2·v_scale
    if dim * gmax * 2 * v_scale > lim:
        raise ValueError(
            f"pca_portable: |G'|max={gmax} would overflow the iteration "
            f"product at dim={dim}, v_scale={v_scale} — raise g_div"
        )
    v = [v_scale] * dim
    for _ in range(rounds):
        w = [sum(g[j][i] * v[i] for i in range(dim)) for j in range(dim)]
        m = max(abs(x) for x in w)
        if m < v_scale:
            raise ValueError(
                "pca_portable: iterate collapsed below v_scale — the "
                "dominant eigenvalue is too small at this g_div; lower "
                "g_div or q_scale"
            )
        d = _tdiv(m, v_scale)
        v = [_tdiv(x, d) for x in w]
    pivot = max(range(dim), key=lambda i: (abs(v[i]), -i))
    if v[pivot] < 0:
        v = [-x for x in v]
    # projection bound from MEASURED maxima: |n·xq_i − Sx_i| ≤ n·max|xq|
    # + max|Sx|
    cmax = n * mx + max(abs(x) for x in sx)
    vmax = max(abs(x) for x in v)
    if dim * cmax * vmax > lim:
        raise ValueError("pca_portable: projection would overflow int64")
    xq = lambda i: F.floor(  # noqa: E731
        F.element_at(F.col(vec_col), i + 1).cast("double") * F.lit(float(q_scale))
        + F.lit(0.5)
    ).cast("long")
    expr = None
    for i in range(dim):
        term = (F.lit(n) * xq(i) - F.lit(sx[i])) * F.lit(v[i])
        expr = term if expr is None else expr + term
    return emb.select(F.col(id_col), expr.alias("pc1_fp"))
