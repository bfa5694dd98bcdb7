"""In-engine trained quality classifier — the model-based curation tier
(DCLM / FineWeb-edu-style filtering, Li et al. 2024 / Penedo et al.
2024) that the heuristic ``quality_score`` feeds into but cannot
replace: a logistic-regression scorer TRAINED INSIDE the engine, per
epoch ONE partial/final aggregate over codegen'd feature expressions
(d+1 doubles of driver state), the kmeans/pca training discipline.

Two tiers, the repo's standard exact/rows-only pair:

- ``logreg_train`` / ``logreg_score`` — float logistic regression:
  sigmoid link, batch gradient descent. Per epoch the gradient is one
  ``groupBy().agg`` of d+1 ``sum`` columns (map-side partial combine,
  single-row collect); the corpus never shuffles and the feature
  arithmetic is ordinary codegen'd SQL expressions (no UDF). Float
  epochs can't hash identically cross-engine (exp/division rounding),
  so queries over this tier are rows-only — its statistical claim
  (held-out AUC on separable data) is pytest-asserted instead.
- ``logreg_portable_train`` / ``logreg_portable_score_frame`` — the
  EXACT-oracle twin: fixed-point integer arithmetic end to end.
  Features quantize to integers in Q units, the link is the hard
  sigmoid clamp(z/4 + 1/2, 0, 1) evaluated with truncating integer
  division (Spark ``div`` == DuckDB ``//`` == ext/pca._tdiv — all
  truncate toward zero), gradients are integer sums (order-independent
  by construction), and the step is an integer mean. Every epoch is
  replayable in any engine from the same stored rows; the DuckDB
  oracle unrolls the identical epochs into CTEs (the kmeans/pca
  pattern) and the full per-doc (p_fp, pred) table compares
  bit-for-bit.

Scale shape (both tiers): training cost is epochs × (one corpus scan +
one ≤(d+2)-column single-row aggregate). Weights are literals baked
into the next epoch's codegen'd plan — no join, no broadcast, no data
shuffle, no UDF anywhere. Scoring is a map-side expression. At 100 TB
the only multi-pass cost is the scan; checkpoint the feature frame
(``ckpt``) so epochs re-read materialized integers, not parquet.

Ref parity n/a (charter extension; the reference has no ML surface).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mesin_spark.ext.ckpt import ckpt
from mesin_spark.ext.pca import _tdiv
from mesin_spark.ext.text import STOPWORDS

__all__ = [
    "Q_FP",
    "logreg_train",
    "logreg_score",
    "quality_features",
    "logreg_portable_train",
    "logreg_portable_score_frame",
    "portable_feature_frame",
]

#: fixed-point scale for the portable tier (6 decimal places — the
#: repo-wide stable_round resolution)
Q_FP = 10**6
_HALF = Q_FP // 2
#: saturation point for the length feature: docs at or past this many
#: whitespace tokens get the full length signal (FineWeb-style "long
#: enough" cap — mirrors quality_score's len/100 saturation, doubled)
_LEN_SAT = 200


# ---------------------------------------------------------------- float tier


def quality_features(text_col: Column | str = "text") -> list[Column]:
    """Default quality feature vector (bias first): saturating length,
    stopword ratio, saturating mean token length — the quality_score
    components as SEPARATE features so training can weight them, all
    codegen'd expressions (no UDF)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    t = F.filter(F.split(F.lower(c), r"\s+"), lambda x: F.length(x) > 0)
    n = F.size(t)
    stop = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    chars = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    nz = F.greatest(n, F.lit(1)).cast("double")
    return [
        F.lit(1.0),
        F.least(n.cast("double") / F.lit(float(_LEN_SAT)), F.lit(1.0)),
        stop.cast("double") / nz,
        F.least(chars.cast("double") / nz / F.lit(8.0), F.lit(1.0)),
    ]


def logreg_train(
    df: DataFrame,
    label_col: Column,
    features: list[Column] | None = None,
    epochs: int = 20,
    lr: float = 1.0,
) -> list[float]:
    """Batch-gradient-descent logistic regression; returns the weight
    list (bias first). ``label_col`` must evaluate to 0/1. Per epoch
    ONE aggregate computes the full-batch gradient Σ (σ(w·x) − y)·x_j
    as d+1 sums + a count (map-side partial combine, single-row
    collect); the driver applies w ← w − lr·g/n. Weights enter the
    next epoch as literals, so every epoch is a fresh codegen'd plan
    over the checkpointed feature frame."""
    if epochs < 1:
        raise ValueError(f"logreg_train: epochs must be >= 1, got {epochs}")
    fx = features if features is not None else quality_features()
    d = len(fx)
    xf = df.select(
        label_col.cast("double").alias("_y"),
        *[fx[j].cast("double").alias(f"_x{j}") for j in range(d)],
    ).transform(ckpt, eager=True)
    w = [0.0] * d
    for _ in range(epochs):
        z = sum(
            (F.col(f"_x{j}") * F.lit(w[j]) for j in range(d)), start=F.lit(0.0)
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        row = xf.agg(
            F.count(F.lit(1)).alias("_n"),
            *[
                F.sum((p - F.col("_y")) * F.col(f"_x{j}")).alias(f"_g{j}")
                for j in range(d)
            ],
        ).collect()[0]
        n = max(int(row["_n"]), 1)
        w = [w[j] - lr * float(row[f"_g{j}"]) / n for j in range(d)]
    return w


def logreg_score(
    w: list[float], features: list[Column] | None = None
) -> Column:
    """σ(w·x) as a map-side codegen'd column — the learned quality
    score, drop-in for quality_score (token_budget_threshold's
    ``quality_col`` accepts it)."""
    fx = features if features is not None else quality_features()
    if len(w) != len(fx):
        raise ValueError(
            f"logreg_score: {len(w)} weights vs {len(fx)} features"
        )
    z = sum(
        (fx[j].cast("double") * F.lit(float(w[j])) for j in range(len(fx))),
        start=F.lit(0.0),
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


# ------------------------------------------------------------- portable tier


def _spark_tok_sql(text_col: str) -> tuple[str, str]:
    """(token count, stopword count) as Spark SQL expression strings —
    the portable whitespace recipe every documents oracle inlines."""
    tk = f"filter(split(lower({text_col}), '\\\\s+'), t -> length(t) > 0)"
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    return (
        f"size({tk})",
        f"size(filter({tk}, t -> t IN ({stops})))",
    )


def portable_feature_frame(
    docs: DataFrame, label_sql: str, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, y, x0, x1, x2) integer feature frame in Q_FP units, eagerly
    checkpointed (the kmeans _quantized_frame discipline) so the
    per-epoch scans read materialized integers:

    - x0 = Q (bias)
    - x1 = least(tok·Q div LEN_SAT, Q)   — saturating length
    - x2 = (stop·Q) div greatest(tok,1)  — stopword ratio

    All truncating integer arithmetic on positive operands — identical
    in Spark, DuckDB, and the pure-Python mirror."""
    tok, stop = _spark_tok_sql(text_col)
    return docs.selectExpr(
        f"{id_col} AS _id",
        f"CAST({label_sql} AS BIGINT) AS _y",
        f"CAST({Q_FP} AS BIGINT) AS _x0",
        f"least(CAST({tok} AS BIGINT) * {Q_FP} div {_LEN_SAT}, {Q_FP}) AS _x1",
        f"(CAST({stop} AS BIGINT) * {Q_FP}) div greatest(CAST({tok} AS BIGINT), 1) AS _x2",
    ).transform(ckpt, eager=True)


def logreg_portable_train(
    xf: DataFrame, epochs: int = 3, d: int = 3
) -> list[int]:
    """Fixed-point gradient descent on the integer feature frame;
    returns integer weights in Q_FP units (bias first), starting from
    zero. Per epoch (every op truncating integer division, _tdiv
    semantics on the driver):

        z_i = (Σ_j x_ij·w_j) div Q
        p_i = clamp(z_i div 4 + Q/2, 0, Q)       — hard sigmoid
        g_j = Σ_i ((p_i − y_i·Q) · x_ij) div Q   — per-term div, so the
              integer sum is order-independent whatever the partitioning
        w_j ← w_j − g_j div n                     — lr = 1, integer mean

    One single-row aggregate per epoch; weights bake into the next
    epoch's plan as literals. The DuckDB oracle unrolls these exact
    epochs (queries/llm.py _logreg_portable_oracle)."""
    if epochs < 0:
        raise ValueError("logreg_portable_train: epochs must be >= 0")
    w = [0] * d
    for _ in range(epochs):
        p = _p_sql(w, d)
        row = xf.selectExpr(
            "_y",
            *[f"_x{j}" for j in range(d)],
            f"{p} AS _p",
        ).selectExpr(
            "count(*) AS _n",
            *[
                f"sum(((_p - {Q_FP} * _y) * _x{j}) div {Q_FP}) AS _g{j}"
                for j in range(d)
            ],
        ).collect()[0]
        n = max(int(row["_n"]), 1)
        w = [w[j] - _tdiv(int(row[f"_g{j}"] or 0), n) for j in range(d)]
    return w


def _p_sql(w: list[int], d: int) -> str:
    """Hard-sigmoid probability (Q units) for literal weights — the one
    expression both the trainer and the scorer compile."""
    z = " + ".join(f"_x{j} * {int(w[j])}" for j in range(d))
    return (
        f"least(greatest((({z}) div {Q_FP}) div 4 + {_HALF}, 0), "
        f"CAST({Q_FP} AS BIGINT))"
    )


def logreg_portable_score_frame(
    xf: DataFrame, w: list[int], id_alias: str = "doc_id"
) -> DataFrame:
    """(id, p_fp, pred, y) under the trained integer weights — the
    bit-exact per-doc output the oracle reproduces. pred is the
    half-point cut (p_fp >= Q/2)."""
    p = _p_sql(w, len(w))
    return xf.selectExpr(
        f"_id AS {id_alias}",
        f"CAST({p} AS BIGINT) AS p_fp",
        f"CAST(CASE WHEN {p} >= {_HALF} THEN 1 ELSE 0 END AS BIGINT) AS pred",
        "CAST(_y AS BIGINT) AS y",
    )


def logreg_portable_py(
    rows: list[tuple[int, list[int]]], epochs: int = 3, d: int = 3
) -> list[int]:
    """Pure-Python mirror of logreg_portable_train for the equivalence
    pytest: rows = [(y, [x0..xd-1])]; returns the weights. Uses _tdiv
    (truncation toward zero), never Python's flooring //."""
    w = [0] * d
    n = max(len(rows), 1)
    for _ in range(epochs):
        g = [0] * d
        for y, x in rows:
            z = _tdiv(sum(x[j] * w[j] for j in range(d)), Q_FP)
            p = min(max(_tdiv(z, 4) + _HALF, 0), Q_FP)
            for j in range(d):
                g[j] += _tdiv((p - Q_FP * y) * x[j], Q_FP)
        w = [w[j] - _tdiv(g[j], n) for j in range(d)]
    return w


def auc_score(scored: DataFrame, score_col: str, label_col: str) -> float:
    """Rank-based ROC AUC (Mann-Whitney) of a 0/1 label vs a score —
    one window rank + one aggregate, the held-out metric the float
    tier's pytest gates on. Average ranks across ties (the standard
    tie-corrected estimator)."""
    from pyspark.sql import Window

    r = scored.withColumn(
        "_rk", F.avg(F.row_number().over(Window.orderBy(F.col(score_col))))
        .over(Window.partitionBy(F.col(score_col)))
    )
    row = r.agg(
        F.sum(F.when(F.col(label_col) == 1, F.col("_rk"))).alias("_sp"),
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0)).alias("_np"),
        F.count(F.lit(1)).alias("_n"),
    ).collect()[0]
    npos = int(row["_np"] or 0)
    nneg = int(row["_n"]) - npos
    if npos == 0 or nneg == 0:
        return float("nan")
    return (float(row["_sp"]) - npos * (npos + 1) / 2.0) / (npos * nneg)


# math kept imported for callers' lr schedules; silence linters
_ = math
