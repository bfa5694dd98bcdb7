"""Portable k-means (Lloyd's) over embedding columns — the clustering
class's cross-engine proof, completing the portable-twin program for the
one family whose TRAINING step still forced rows-only checks: the
engine-native codebook trainers (ext/pq._kmeans_euclid, the spherical
sampler in ext/similarity) are float-iterative and seeded-random, so
their assignments can never hash identically in an independent engine.
Here every step is exact integer arithmetic derivable from the stored
rows:

1. quantize: xq_i = floor(x_i · q_scale + 0.5) (exact on IEEE doubles);
2. init: centroids = the quantized vectors of ids 0..k-1 (the
   ivf_portable seed-centroid trick — any engine reads the same rows);
3. per Lloyd round:
   - assignment = argmin over centroids of the integer squared L2
     Σ_i (xq_i − c_i)², ties to the SMALLEST centroid id;
   - update: c'_i = (Σ_{cluster} xq_i) div |cluster| in truncating
     integer division (Spark `div` == DuckDB `//`; Python's floor-div
     deliberately avoided — ext/pca._tdiv); an emptied cluster keeps
     its previous centroid.
4. output: (id, cluster) after the final assignment — bit-identical in
   any engine running the same rounds.

Scale shape (the IVF codebook pattern): the corpus never moves — each
round is ONE map-side literal-array assignment pass (k·d integer
literals compiled into the plan, no UDF) plus one groupBy(cluster)
aggregate whose output is k rows of d integer sums (map-side partial
combine; the exchange moves ≤ k·#partitions partial rows); the k×d
centroid table is a bounded driver collect per round, exactly like the
IVF/PQ codebook collects. No per-round shuffle of the data, no join.
At 100 TB the cost is rounds × (one scan + one k-row aggregate) — the
textbook distributed Lloyd's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mesin_spark.ext.ckpt import ckpt

from mesin_spark.ext.pca import _tdiv

__all__ = ["kmeans_portable_assign", "kmeans_portable_train"]


def _quant_col(vec_col: str, q_scale: int):
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(q_scale)) + F.lit(0.5)).cast(
            "long"
        ),
    )


def _assign_expr(centroids: list[list[int]]):
    """Cluster id for the quantized array column `_xq`: argmin of integer
    squared L2 against each literal centroid, first (= smallest id) on
    ties via array_position."""
    dists = [
        F.aggregate(
            F.zip_with(
                F.col("_xq"),
                F.array(*[F.lit(int(v)) for v in c]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        for c in centroids
    ]
    arr = F.array(*dists)
    # array_position returns the FIRST index of the minimum (1-based) —
    # exactly the smallest-centroid-id tie rule the oracle mirrors
    return (F.array_position(arr, F.array_min(arr)) - 1).cast("bigint")


def _quantized_frame(
    emb: DataFrame, id_col: str, vec_col: str, q_scale: int
) -> DataFrame:
    """(id, _xq) eagerly checkpointed ONCE so the per-round assignment
    scans (and the final output pass) read the quantized integers from
    memory instead of re-deriving them from parquet every round. At
    cluster scale substitute persist(DISK_ONLY)/a staging write — the
    arithmetic is unchanged either way (quantization is deterministic),
    this is purely a recompute-avoidance knob."""
    return emb.select(
        F.col(id_col), _quant_col(vec_col, q_scale).alias("_xq")
    ).transform(ckpt, eager=True)


def kmeans_portable_train(
    emb: DataFrame,
    k: int = 8,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    q_scale: int = 10**4,
    _xqf: DataFrame | None = None,
) -> list[list[int]]:
    """Run ``rounds`` integer Lloyd steps and return the final k×d
    centroid table (quantized-unit integers). Bounded collects only:
    the k seed rows, then one k-row aggregate per round."""
    if k < 1 or rounds < 0:
        raise ValueError("kmeans_portable: need k >= 1 and rounds >= 0")
    if _xqf is None:
        _xqf = _quantized_frame(emb, id_col, vec_col, q_scale)
    seeds = _xqf.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("_c"), "_xq"
    ).collect()
    if len(seeds) != k:
        raise ValueError(
            f"kmeans_portable: need ids 0..{k - 1} as seed centroids, "
            f"found {len(seeds)} — the deterministic-init contract "
            "(ivf_portable pattern) requires those rows to exist"
        )
    cents = [None] * k
    for r in seeds:
        cents[int(r["_c"])] = [int(v) for v in r["_xq"]]
    if any(c is None or len(c) != dim for c in cents):
        raise ValueError("kmeans_portable: seed rows must carry dim-length vectors")
    xq = _xqf.select("_xq")
    for _ in range(rounds):
        sums = (
            xq.withColumn("_cl", _assign_expr(cents))
            .groupBy("_cl")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(F.element_at("_xq", i + 1)).alias(f"_s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        nxt = [list(c) for c in cents]  # emptied cluster keeps its centroid
        for row in sums:
            j = int(row["_cl"])
            n_j = int(row["_n"])
            nxt[j] = [_tdiv(int(row[f"_s{i}"]), n_j) for i in range(dim)]
        cents = nxt
    return cents


def kmeans_portable_assign(
    emb: DataFrame,
    k: int = 8,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    q_scale: int = 10**4,
) -> DataFrame:
    """(id, cluster, dist_fp) after ``rounds`` integer Lloyd steps —
    cluster is the final argmin assignment, dist_fp its integer squared
    L2 in quantized units. Bit-reproducible cross-engine; see module
    docstring for the arithmetic contract."""
    xqf = _quantized_frame(emb, id_col, vec_col, q_scale)
    cents = kmeans_portable_train(
        emb, k, rounds, id_col, vec_col, dim, q_scale, _xqf=xqf
    )
    out = xqf
    dists = [
        F.aggregate(
            F.zip_with(
                F.col("_xq"),
                F.array(*[F.lit(int(v)) for v in c]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        for c in cents
    ]
    arr = F.array(*dists)
    return out.select(
        F.col(id_col),
        (F.array_position(arr, F.array_min(arr)) - 1).cast("bigint").alias("cluster"),
        F.array_min(arr).cast("bigint").alias("dist_fp"),
    )
