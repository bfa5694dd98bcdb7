"""Similarity search over embedding columns (array<float>).

Two tiers, per the charter:
- brute-force cosine top-k: one codegen'd scan + TakeOrderedAndProject —
  the exact baseline, linear in corpus size, embarrassingly parallel
  (each partition keeps a k-heap; the driver merges k·numPartitions rows);
- LSH-bucketed ANN (random hyperplanes): prune the scan to a handful of
  signature buckets, then exact-rank inside them — the 100 TB path when
  a full scan per query is too expensive. Buckets are a plain equi-filter,
  so partition pruning applies if the corpus is written partitioned by
  signature.

All vector math is built-in higher-order functions (zip_with/aggregate) —
JVM-side, no Python/UDF in the hot path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mesin_spark.functions import stable_round as R


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns (computed in double)."""
    ad, bd = _as_double(a), _as_double(b)
    return dot(ad, bd) / (norm(ad) * norm(bd))


def lit_vector(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector. Deterministic
    tie-break on id. Returns (id, sim)."""
    q = lit_vector(query_vec)
    return (
        emb.select(
            F.col(id_col),
            R(cosine(F.col(vec_col), q), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc_nulls_last(), F.col(id_col).asc_nulls_last())
        .limit(k)
    )


# -- LSH (random hyperplanes) ---------------------------------------------
def _plane_component(plane: int, dim: int) -> int:
    """Deterministic ±1 hyperplane component from a stable hash (md5) — no
    RNG state, reproducible across engines/runs/machines."""
    h = hashlib.md5(f"mesin:{plane}:{dim}".encode()).digest()
    return 1 if h[0] % 2 == 0 else -1


def hyperplanes(n_planes: int, dims: int) -> list[list[int]]:
    return [[_plane_component(p, d) for d in range(dims)] for p in range(n_planes)]


def signature_col(vec_col: Column, planes: list[list[int]]) -> Column:
    """Pack sign(v·plane_i) bits into one integer signature — built-ins only."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = dot(_as_double(vec_col), F.array(*[F.lit(float(c)) for c in plane]))
        sig = sig + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def signature_py(vec: list[float], planes: list[list[int]]) -> int:
    sig = 0
    for i, plane in enumerate(planes):
        if sum(float(v) * c for v, c in zip(vec, plane)) > 0:
            sig |= 1 << i
    return sig


def _neighbor_signatures(sig: int, n_planes: int, max_flips: int) -> list[int]:
    """All signatures within Hamming distance max_flips (multi-probe LSH)."""
    out = {sig}
    frontier = {sig}
    for _ in range(max_flips):
        nxt = set()
        for s in frontier:
            for b in range(n_planes):
                nxt.add(s ^ (1 << b))
        out |= nxt
        frontier = nxt
    return sorted(out)


def lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    probe_flips: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: restrict the exact ranking to buckets within
    ``probe_flips`` signature bits of the query's bucket. At scale, write
    the corpus partitioned by ``lsh_sig`` so this filter becomes partition
    pruning and the scan touches only the probed buckets."""
    planes = hyperplanes(n_planes, len(query_vec))
    qsig = signature_py(query_vec, planes)
    probes = _neighbor_signatures(qsig, n_planes, probe_flips)
    bucketed = emb.withColumn("lsh_sig", signature_col(F.col(vec_col), planes))
    candidates = bucketed.filter(F.col("lsh_sig").isin(probes))
    q = lit_vector(query_vec)
    return (
        candidates.select(
            F.col(id_col),
            R(cosine(F.col(vec_col), q), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc_nulls_last(), F.col(id_col).asc_nulls_last())
        .limit(k)
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact near-duplicate pairs (cosine ≥ threshold) within a blocking
    key. Blocking bounds the quadratic pair space — at 100 TB use an LSH
    signature as the block key (same code path, cheaper key). Returns
    (id_a, id_b, sim), id_a < id_b."""
    a = emb.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
    )
    b = emb.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
    )
    pairs = a.join(b, on="blk").filter(F.col("id_a") < F.col("id_b"))
    sim = R(cosine(F.col("vec_a"), F.col("vec_b")), 6)
    return (
        pairs.select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
