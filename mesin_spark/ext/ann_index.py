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
import pandas as pd
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
        stats: dict | None = None,
    ):
        self.spark = spark
        self.path = path
        self.centroids = centroids
        self.codebooks = codebooks
        self.id_col = id_col
        self.corpus_dir = corpus_dir
        #: per-list build baselines + cumulative append counters
        #: ({"lists": {list: {rows, fit}}, "appended": {list: {rows, fit}}})
        self.stats = stats or {"lists": {}, "appended": {}}

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


def _ivf_fit(centroids, vec_col: str = "embedding"):
    """Per-vector coarse-quantizer FIT: cosine to the NEAREST stored
    centroid (== the similarity ivf_assign maximized). The scalar whose
    per-list batch average, compared to the build-time baseline, detects
    distribution drift without touching the built corpus."""
    C = centroids

    @F.pandas_udf("double")
    def fit(vs: pd.Series) -> pd.Series:
        out = np.zeros(len(vs), dtype=np.float64)
        for i, v in enumerate(vs):
            a = np.asarray(v, dtype=np.float64)
            n = np.linalg.norm(a)
            if n > 0:
                out[i] = float(np.max(C @ (a / n)))
        return pd.Series(out)

    return fit(F.col(vec_col))


def _list_stats(coded) -> dict:
    """Bounded per-list aggregate (≤ n_list rows): row count + mean fit."""
    rows = (
        coded.groupBy("ivf_list")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("_fit").alias("fit"))
        .collect()
    )
    return {
        str(int(r["ivf_list"])): {
            "rows": int(r["n"]),
            "fit": round(float(r["fit"] or 0.0), 6),
        }
        for r in rows
    }


def _write_meta(path: str, meta: dict) -> None:
    os.makedirs(path, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, META_FILE))


def build_index(
    emb: DataFrame,
    path: str,
    n_list: int = 16,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus: DataFrame | None = None,
) -> IvfPqIndex:
    """Train (seeded, deterministic) and persist the index: ONE pass over
    the corpus computes both the IVF assignment and the PQ codes
    (Arrow-batched), written partitioned by ``ivf_list``. Incremental
    adds go through ``append_batch`` (frozen artifacts, per-list drift
    counters — standard FAISS practice: retrain only when the
    distribution drifts); a rebuild is a fresh ``build_index`` (the
    versioned corpus dir + atomic meta replace keep readers consistent
    throughout).

    ``corpus`` (default: ``emb``) separates the TRAINING frame from the
    INGESTED frame — the hook that makes append-vs-rebuild equality
    exactly testable (train both on the same frame, ingest differently)
    and lets a deployment train on a stratified sample while coding the
    full table."""
    spark = emb.sparkSession
    C = ivf_centroids(emb, n_list, id_col, vec_col)
    B = pq_codebooks(emb, m=m, k=k, id_col=id_col, vec_col=vec_col)
    coded = (
        (corpus if corpus is not None else emb)
        .withColumn("ivf_list", ivf_assign(C, vec_col))
        .withColumn("codes", pq_encode(B, vec_col))
        .withColumn("_fit", _ivf_fit(C, vec_col))
        .select(id_col, "codes", "ivf_list", "_fit")
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
    # the codes table is consumed twice (the partitioned write + the
    # bounded per-list stats aggregate) — persist so the Arrow-batched
    # encode pass runs once
    coded = coded.persist()
    try:
        coded.drop("_fit").write.partitionBy("ivf_list").mode("overwrite").parquet(
            os.path.join(path, corpus_dir)
        )
        lists = _list_stats(coded)
    finally:
        coded.unpersist(blocking=False)
    meta = {
        "id_col": id_col,
        "corpus_dir": corpus_dir,
        "n_list": int(C.shape[0]),
        "m": int(B.shape[0]),
        "k": int(B.shape[1]),
        "dsub": int(B.shape[2]),
        "centroids": C.tolist(),
        "codebooks": B.tolist(),
        "lists": lists,
        "appended": {},
    }
    _write_meta(path, meta)
    return IvfPqIndex(
        spark, path, C, B, id_col, corpus_dir,
        stats={"lists": lists, "appended": {}},
    )


def append_batch(
    index: IvfPqIndex,
    batch: DataFrame,
    vec_col: str = "embedding",
    occupancy_factor: float = 1.0,
    fit_drop_max: float = 0.05,
) -> DataFrame:
    """Incremental index maintenance — the Delta-ingest ANN pattern a
    100 TB corpus needs: encode ONLY the arriving batch with the
    PERSISTED (frozen) centroids + codebooks, APPEND its (id, codes)
    rows to the partitioned codes table, and track per-list drift so a
    retrain is a measured decision instead of a per-batch rebuild.

    Appended codes are byte-identical to what a rebuild with the same
    artifacts would produce (pytest-asserted: build-on-part + append ≡
    build-on-full when both train on the same frame), so queries over
    the reopened index see the union seamlessly — partition pruning,
    ADC scan, and recall behavior unchanged.

    Drift is two bounded per-list signals, judged against the
    build-time baselines stored in the index meta:

    - occupancy: cumulative appended rows vs built rows — a list
      absorbing more than ``occupancy_factor`` x its built population
      has outgrown its build-time geometry (probe cost for that list
      grows past its share);
    - fit: the batch's mean cosine to its assigned centroid vs the
      build-time per-list mean — a drop past ``fit_drop_max`` means the
      frozen quantizer no longer represents arriving vectors
      (reassignment-share proxy measurable WITHOUT re-training).

    Returns the per-list drift report (ivf_list, built_rows, built_fit,
    appended_rows cumulative, batch_rows, batch_fit, occupancy_ratio,
    fit_drop, needs_rebuild), deterministic order by ivf_list. Meta
    counters update atomically (same single-commit replace as build),
    so a reopened index resumes the cumulative occupancy history.

    Consistency contract (round-11 ADVICE): appends assume a SINGLE
    WRITER — the parquet append into the live corpus dir is not
    atomic, so concurrent appends (or a reader racing one) can observe
    a partially-written batch; the versioned-dir + atomic-meta story
    covers REBUILDS only. To make a crashed append detectable instead
    of silently undercounting forever, the append is bracketed: a
    ``pending_batch`` marker commits to the meta BEFORE the data write
    and clears in the same atomic replace that folds the batch into the
    counters. ``load_index`` warns when the marker is still set — the
    recovery is a rebuild (or re-run of the batch after removing the
    marker; re-appending duplicates rows, so rebuild is the safe
    default)."""
    # meta-first: commit the pending marker so a crash mid-append is
    # visible to every future open (counters would otherwise silently
    # exclude the batch's rows from occupancy/fit baselines forever)
    with open(os.path.join(index.path, META_FILE)) as f:
        meta = json.load(f)
    batch_id = int(meta.get("n_batches", 0)) + 1
    meta["pending_batch"] = {"batch_id": batch_id}
    _write_meta(index.path, meta)
    coded = (
        batch.withColumn("ivf_list", ivf_assign(index.centroids, vec_col))
        .withColumn("codes", pq_encode(index.codebooks, vec_col))
        .withColumn("_fit", _ivf_fit(index.centroids, vec_col))
        .select(index.id_col, "codes", "ivf_list", "_fit")
        .persist()
    )
    try:
        coded.drop("_fit").write.partitionBy("ivf_list").mode("append").parquet(
            os.path.join(index.path, index.corpus_dir)
        )
        batch_stats = _list_stats(coded)
    finally:
        coded.unpersist(blocking=False)

    # fold this batch into the cumulative append counters (weighted fit)
    appended = index.stats.setdefault("appended", {})
    for lst, st in batch_stats.items():
        prev = appended.get(lst, {"rows": 0, "fit": 0.0})
        n = prev["rows"] + st["rows"]
        appended[lst] = {
            "rows": n,
            "fit": round(
                (prev["fit"] * prev["rows"] + st["fit"] * st["rows"]) / max(n, 1), 6
            ),
        }
    # one atomic replace both folds the counters AND clears the pending
    # marker — at every instant the meta is either "batch not started"
    # or "batch fully accounted", never torn between data and counters
    meta["appended"] = appended
    meta.setdefault("lists", index.stats.get("lists", {}))
    meta["n_batches"] = batch_id
    meta["pending_batch"] = None
    _write_meta(index.path, meta)

    built = index.stats.get("lists", {})
    report = []
    for lst in sorted(set(built) | set(appended), key=int):
        b = built.get(lst, {"rows": 0, "fit": 0.0})
        a = appended.get(lst, {"rows": 0, "fit": 0.0})
        s = batch_stats.get(lst, {"rows": 0, "fit": 0.0})
        occ = a["rows"] / max(b["rows"], 1)
        drop = round(b["fit"] - s["fit"], 6) if s["rows"] else 0.0
        report.append(
            (
                int(lst), b["rows"], float(b["fit"]), a["rows"], s["rows"],
                float(s["fit"]), round(occ, 6), drop,
                bool(occ > occupancy_factor or drop > fit_drop_max),
            )
        )
    return index.spark.createDataFrame(
        report,
        "ivf_list int, built_rows long, built_fit double, appended_rows long, "
        "batch_rows long, batch_fit double, occupancy_ratio double, "
        "fit_drop double, needs_rebuild boolean",
    )


def compact_index(
    index: IvfPqIndex, max_files_per_list: int = 8, force: bool = False
) -> dict:
    """Small-file compaction for the incremental codes table — the
    steady-state maintenance append_batch makes necessary: every append
    writes its own parquet file(s) into each touched ``ivf_list=``
    partition, so after thousands of batches a probe's partition-pruned
    read degrades into a small-file walk (footer reads + task-per-file
    scheduling dominate the scan). This is the dml.DdlSession.compact
    (OPTIMIZE) discipline applied to the index's own layout:

    - decision from DRIVER-SIDE listing only (no Spark job): count data
      files per list partition; compact when any list exceeds
      ``max_files_per_list`` (or ``force``);
    - rewrite = one distributed read of the live codes dir,
      ``repartition(ivf_list)`` so each list lands in exactly one task
      → ONE file per list partition dir, written ``partitionBy`` into
      the NEXT versioned corpus dir;
    - commit = the same atomic meta replace a rebuild uses: readers see
      the old dir until the pointer swaps, then the compacted one —
      never a half-rewritten table. Occupancy/fit baselines are
      untouched (compaction moves bytes, not rows).

    Old corpus dirs stay on disk for in-flight readers / rollback;
    ``vacuum_index`` removes the non-current ones. Maintenance cadence:
    run when the drift report is quiet but appends are frequent —
    e.g. every ~``max_files_per_list`` batches; a rebuild (which always
    writes compact) resets the clock. Returns a report dict
    (compacted, files_before, files_after, worst_list_files,
    corpus_dir)."""
    src = os.path.join(index.path, index.corpus_dir)
    per_list: dict[str, int] = {}
    for entry in os.scandir(src):
        if entry.is_dir() and entry.name.startswith("ivf_list="):
            per_list[entry.name] = sum(
                1
                for f in os.scandir(entry.path)
                if f.is_file()
                and (f.name.endswith(".parquet") or f.name.startswith("part-"))
            )
    files_before = sum(per_list.values())
    worst = max(per_list.values(), default=0)
    if worst <= max_files_per_list and not force:
        return {
            "compacted": False,
            "files_before": files_before,
            "files_after": files_before,
            "worst_list_files": worst,
            "corpus_dir": index.corpus_dir,
        }
    existing = [
        d for d in os.listdir(index.path)
        if d.startswith(CORPUS_DIR) and os.path.isdir(os.path.join(index.path, d))
    ]
    nxt = f"{CORPUS_DIR}_v{len(existing) + 1:05d}"
    (
        index.spark.read.parquet(src)
        .repartition(F.col("ivf_list"))
        .write.partitionBy("ivf_list")
        .mode("overwrite")
        .parquet(os.path.join(index.path, nxt))
    )
    with open(os.path.join(index.path, META_FILE)) as f:
        meta = json.load(f)
    meta["corpus_dir"] = nxt
    _write_meta(index.path, meta)
    index.corpus_dir = nxt
    after = 0
    for entry in os.scandir(os.path.join(index.path, nxt)):
        if entry.is_dir() and entry.name.startswith("ivf_list="):
            after += sum(
                1
                for f in os.scandir(entry.path)
                if f.is_file()
                and (f.name.endswith(".parquet") or f.name.startswith("part-"))
            )
    return {
        "compacted": True,
        "files_before": files_before,
        "files_after": after,
        "worst_list_files": worst,
        "corpus_dir": nxt,
    }


def vacuum_index(index: IvfPqIndex) -> list[str]:
    """Remove corpus dirs the meta no longer points at (the VACUUM to
    compact_index's OPTIMIZE). Call once no reader can still hold the
    old dir open — same contract as table vacuum after compaction.
    Returns the removed dir names."""
    import shutil

    removed = []
    for d in sorted(os.listdir(index.path)):
        if (
            d.startswith(CORPUS_DIR)
            and d != index.corpus_dir
            and os.path.isdir(os.path.join(index.path, d))
        ):
            shutil.rmtree(os.path.join(index.path, d))
            removed.append(d)
    return removed


def load_index(spark: SparkSession, path: str) -> IvfPqIndex:
    with open(os.path.join(path, META_FILE)) as f:
        meta = json.load(f)
    if meta.get("pending_batch"):
        import warnings

        warnings.warn(
            f"ANN index at {path!r} has an uncommitted append "
            f"(batch_id={meta['pending_batch'].get('batch_id')}): a prior "
            "append_batch crashed between its data write and its counter "
            "commit. The codes table may hold rows the occupancy/fit "
            "baselines do not account for — rebuild the index (or verify "
            "and clear the marker) before trusting drift reports.",
            stacklevel=2,
        )
    return IvfPqIndex(
        spark,
        path,
        np.asarray(meta["centroids"], dtype=np.float64),
        np.asarray(meta["codebooks"], dtype=np.float64),
        meta["id_col"],
        # older metas predate corpus versioning — fall back to the fixed dir
        meta.get("corpus_dir", CORPUS_DIR),
        stats={
            "lists": meta.get("lists", {}),
            "appended": meta.get("appended", {}),
        },
    )
