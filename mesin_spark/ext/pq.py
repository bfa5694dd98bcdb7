"""Product quantization (PQ) for approximate nearest neighbor — the
IVF-PQ compression half of the FAISS design, on Spark primitives.

Vectors are L2-normalized, chopped into ``m`` subspaces, and each
subvector replaced by the id of its nearest per-subspace centroid
(``k`` codes, so a 64-dim float vector compresses to ``m`` small ints —
at 100 TB the codes table is ~2 orders of magnitude smaller than the
raw embeddings and is what the query-time scan reads).

Query time is asymmetric distance computation (ADC): the query builds an
(m x k) lookup table of subspace inner products, and every corpus
vector's approximate cosine is the sum of m table entries selected by its
codes. The scan is pure JVM (higher-order functions over a literal LUT
array) — Python appears only in the one-time encode pass (Arrow-batched
numpy), never per query.

Train/encode mirror ext/similarity.ivf_centroids: a hash-ordered seeded
sample, driver-side numpy k-means over the SAMPLE only (bounded collect),
fully deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mesin_spark.ext.similarity import _l2_rows
from mesin_spark.functions import stable_round as R

__all__ = ["pq_codebooks", "pq_encode", "pq_topk", "ivfpq_topk"]


def _kmeans_euclid(X: np.ndarray, k: int, n_iter: int, rng) -> np.ndarray:
    """Seeded k-means++ init + Lloyd rounds, plain euclidean, sample-sized."""
    X = np.unique(X, axis=0)
    k = min(k, len(X))
    chosen = [int(rng.integers(len(X)))]
    d2 = ((X - X[chosen[0]]) ** 2).sum(axis=1)
    while len(chosen) < k:
        total = d2.sum()
        if total <= 0:
            remaining = [i for i in range(len(X)) if i not in chosen]
            chosen.append(int(remaining[0]))
        else:
            chosen.append(int(rng.choice(len(X), p=d2 / total)))
        d2 = np.minimum(d2, ((X - X[chosen[-1]]) ** 2).sum(axis=1))
    C = X[chosen].copy()
    for _ in range(n_iter):
        assign = np.argmin(
            ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), axis=1
        )
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
    n_iter: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Train per-subspace codebooks on a deterministic sample.

    Returns (m, k, dim//m); requires dim divisible by m. The sample is the
    same bounded hash-ordered TakeOrdered as ivf_centroids — one
    distributed pass, broadcast-dim-sized driver collect."""
    rows = (
        emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn("_r", F.xxhash64(F.col("_id"), F.lit(seed)))
        .orderBy("_r", "_id")
        .limit(sample_size)
        .collect()
    )
    X = _l2_rows(np.stack([np.asarray(r["_v"], dtype=np.float64) for r in rows]))
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.zeros((m, k, dsub))
    for j in range(m):
        C = _kmeans_euclid(X[:, j * dsub : (j + 1) * dsub], k, n_iter, rng)
        books[j, : len(C)] = C
        if len(C) < k:  # degenerate sample: repeat last centroid
            books[j, len(C) :] = C[-1]
    return books


def pq_encode(codebooks: np.ndarray, vec_col: str = "embedding") -> Column:
    """array<int> of m codes per vector — Arrow-batched numpy argmin over
    each subspace. Runs ONCE at ingest; the codes column is what ships to
    the query-time scan."""
    B = codebooks
    m, k, dsub = B.shape

    @F.pandas_udf("array<integer>")
    def encode(vs: pd.Series) -> pd.Series:
        out = []
        for v in vs:
            a = np.asarray(v, dtype=np.float64)
            n = np.linalg.norm(a)
            if n > 0:
                a = a / n
            codes = [
                int(
                    np.argmin(
                        ((B[j] - a[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1)
                    )
                )
                for j in range(m)
            ]
            out.append(codes)
        return pd.Series(out)

    return encode(F.col(vec_col))


def pq_topk(
    emb: DataFrame,
    query_vec: list[float],
    topk: int = 10,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: (id, approx_sim), approx_sim = Σ_j <q_j, c_{j,code_j}>
    ≈ cosine for unit vectors. The corpus scan evaluates a two-arg
    transform over the codes against an (m·k)-entry literal LUT and fuses
    into TakeOrderedAndProject — same shape as the exact brute-force scan
    but over codes instead of floats."""
    B = pq_codebooks(emb, m=m, k=k, id_col=id_col, vec_col=vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    dsub = B.shape[2]
    # LUT[j][c] = inner product of query subvector j with codebook entry c
    lut = np.einsum("jkd,jd->jk", B, qn.reshape(m, dsub))
    flat = F.array(*[F.lit(float(v)) for v in lut.reshape(-1)])
    codes = pq_encode(B, vec_col)
    scored = emb.select(
        F.col(id_col), codes.alias("codes")
    ).select(
        id_col,
        F.aggregate(
            F.transform(
                "codes", lambda c, j: F.element_at(flat, j * k + c + 1)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("approx_sim"),
    )
    return scored.select(
        id_col, R(F.col("approx_sim"), 6).alias("approx_sim")
    ).orderBy(
        F.col("approx_sim").desc_nulls_last(), F.col(id_col).asc_nulls_last()
    ).limit(topk)


def ivfpq_topk(
    emb: DataFrame,
    query_vec: list[float],
    topk: int = 10,
    n_list: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full FAISS IVF-PQ composition: coarse-quantize the corpus into
    ``n_list`` IVF lists, PQ-compress every vector to ``m`` codes, then
    answer a query by probing its ``n_probe`` nearest lists and ADC-ranking
    ONLY those candidates — the two prunings multiply: the scan touches
    n_probe/n_list of the rows and reads codes instead of floats. At scale
    the corpus is written partitioned by ``ivf_list`` with the codes
    column, so the probe filter is partition pruning and raw embeddings
    never leave storage. Returns (id, approx_sim)."""
    import numpy as np

    from mesin_spark.ext.similarity import ivf_assign, ivf_centroids

    C = ivf_centroids(emb, n_list, id_col, vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    probe = [int(i) for i in np.argsort(-(C @ qn))[:n_probe]]

    B = pq_codebooks(emb, m=m, k=k, id_col=id_col, vec_col=vec_col)
    dsub = B.shape[2]
    lut = np.einsum("jkd,jd->jk", B, qn.reshape(m, dsub))
    flat = F.array(*[F.lit(float(v)) for v in lut.reshape(-1)])

    # filter on the coarse assignment BEFORE computing PQ codes: both are
    # pandas UDFs, and projecting codes alongside ivf_list would make
    # Catalyst run the expensive encode over 100% of rows while only
    # n_probe/n_list survive to scoring
    assigned = emb.withColumn("ivf_list", ivf_assign(C, vec_col))
    cands = assigned.filter(F.col("ivf_list").isin(probe)).withColumn(
        "codes", pq_encode(B, vec_col)
    )
    scored = cands.select(
        F.col(id_col),
        F.aggregate(
            F.transform("codes", lambda c, j: F.element_at(flat, j * k + c + 1)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("approx_sim"),
    )
    return scored.select(
        id_col, R(F.col("approx_sim"), 6).alias("approx_sim")
    ).orderBy(
        F.col("approx_sim").desc_nulls_last(), F.col(id_col).asc_nulls_last()
    ).limit(topk)
