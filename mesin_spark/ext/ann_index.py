"""Persisted ANN index: the IVF-PQ artifacts (coarse centroids, PQ
codebooks, and the coded corpus partitioned by IVF list) written once as
a reusable on-disk index, instead of re-deriving them per query
(ext/pq.ivfpq_topk's shape, made durable).

This is the 100 TB serving layout: the corpus is stored as
``corpus/ivf_list=<n>/`` parquet partitions holding only (id, codes) —
8 small ints per vector instead of the float embedding — so a query's
probe-list filter becomes PARTITION PRUNING at file-listing time
(asserted in tests/test_scale_plans.py) and the scan reads
n_probe/n_list of an already-32x-compressed table. Raw embeddings never
leave the source table. Index metadata (centroids + codebooks, a few
hundred KB at any corpus size — k·m·dim floats) travels as one JSON
document, the same single-commit pattern as Catalog.save.

The reference has no ANN tier at all (SURVEY.md §2.11 charter
extension); the design follows FAISS's IVF-PQ split (Jégou et al. 2011)
re-expressed as parquet layout + Catalyst pruning.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mesin_spark.ext.pq import pq_codebooks, pq_encode
from mesin_spark.ext.similarity import ivf_assign, ivf_centroids
from mesin_spark.functions import stable_round as R

META_FILE = "index_meta.json"
CORPUS_DIR = "corpus"


class IvfPqIndex:
    """Handle over a persisted IVF-PQ index directory."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        centroids: np.ndarray,
        codebooks: np.ndarray,
        id_col: str,
        corpus_dir: str = CORPUS_DIR,
    ):
        self.spark = spark
        self.path = path
        self.centroids = centroids
        self.codebooks = codebooks
        self.id_col = id_col
        self.corpus_dir = corpus_dir

    @property
    def k(self) -> int:
        return self.codebooks.shape[1]

    def topk(self, query_vec: list[float], topk: int = 10, n_probe: int = 4) -> DataFrame:
        """ADC top-k over the persisted coded corpus, scanning ONLY the
        ``n_probe`` probed list partitions (partition pruning — the
        filter never executes per-row). Ties break by id for
        determinism, same policy as ext/pq."""
        q = np.asarray(query_vec, dtype=np.float64)
        qn = q / (np.linalg.norm(q) or 1.0)
        probe = [int(i) for i in np.argsort(-(self.centroids @ qn))[:n_probe]]
        m, k, dsub = self.codebooks.shape
        lut = np.einsum("jkd,jd->jk", self.codebooks, qn.reshape(m, dsub))
        flat = F.array(*[F.lit(float(v)) for v in lut.reshape(-1)])
        corpus = self.spark.read.parquet(os.path.join(self.path, self.corpus_dir))
        cands = corpus.filter(F.col("ivf_list").isin(probe))
        scored = cands.select(
            F.col(self.id_col),
            F.aggregate(
                F.transform("codes", lambda c, j: F.element_at(flat, j * k + c + 1)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("approx_sim"),
        )
        return (
            scored.select(
                self.id_col, R(F.col("approx_sim"), 6).alias("approx_sim")
            )
            .orderBy(
                F.col("approx_sim").desc_nulls_last(),
                F.col(self.id_col).asc_nulls_last(),
            )
            .limit(topk)
        )


def build_index(
    emb: DataFrame,
    path: str,
    n_list: int = 16,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IvfPqIndex:
    """Train (seeded, deterministic) and persist the index: ONE pass over
    the corpus computes both the IVF assignment and the PQ codes
    (Arrow-batched), written partitioned by ``ivf_list``. Rebuilds are
    full-refresh by design — incremental adds would append to the same
    partition dirs with the SAME frozen codebooks (standard FAISS
    practice: retrain only when the distribution drifts)."""
    spark = emb.sparkSession
    C = ivf_centroids(emb, n_list, id_col, vec_col)
    B = pq_codebooks(emb, m=m, k=k, id_col=id_col, vec_col=vec_col)
    coded = (
        emb.withColumn("ivf_list", ivf_assign(C, vec_col))
        .withColumn("codes", pq_encode(B, vec_col))
        .select(id_col, "codes", "ivf_list")
    )
    # VERSIONED corpus dir named in the meta: codes must never be read
    # under other codebooks, so writing corpus and meta to fixed names
    # would leave new codes paired with old codebooks if the driver died
    # between the two writes. Writing to a fresh dir and committing both
    # the dir NAME and the codebooks in one atomic meta replace makes the
    # pair consistent at every instant (old meta → old dir + old books).
    os.makedirs(path, exist_ok=True)
    existing = [
        d for d in os.listdir(path)
        if d.startswith(CORPUS_DIR) and os.path.isdir(os.path.join(path, d))
    ]
    corpus_dir = f"{CORPUS_DIR}_v{len(existing) + 1:05d}"
    coded.write.partitionBy("ivf_list").mode("overwrite").parquet(
        os.path.join(path, corpus_dir)
    )
    meta = {
        "id_col": id_col,
        "corpus_dir": corpus_dir,
        "n_list": int(C.shape[0]),
        "m": int(B.shape[0]),
        "k": int(B.shape[1]),
        "dsub": int(B.shape[2]),
        "centroids": C.tolist(),
        "codebooks": B.tolist(),
    }
    os.makedirs(path, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, META_FILE))
    return IvfPqIndex(spark, path, C, B, id_col, corpus_dir)


def load_index(spark: SparkSession, path: str) -> IvfPqIndex:
    with open(os.path.join(path, META_FILE)) as f:
        meta = json.load(f)
    return IvfPqIndex(
        spark,
        path,
        np.asarray(meta["centroids"], dtype=np.float64),
        np.asarray(meta["codebooks"], dtype=np.float64),
        meta["id_col"],
        # older metas predate corpus versioning — fall back to the fixed dir
        meta.get("corpus_dir", CORPUS_DIR),
    )
