"""In-engine trained quality classifier (ext/classifier.py): the
portable fixed-point tier must be bit-reproducible (pure-Python mirror
equality — the kmeans/BPE discipline) and actually LEARN on separable
data; the float tier's statistical claim is held-out AUC; and the
learned score must drop into token_budget_threshold via quality_col."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mesin_spark.ext import classifier as C


def _separable_docs(spark, n=120):
    """Deterministic separable corpus: label-1 docs are longer and
    stopword-heavy (English-ish), label-0 docs are short junk."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            rows.append(
                (i, "the quick brown fox and the lazy dog of it is in "
                    "the house to go and see the light of day " + "word " * (i % 7),
                 1)
            )
        else:
            rows.append((i, "zxqv wkrp bldf qq" + "z" * (i % 5), 0))
    return spark.createDataFrame(rows, "doc_id bigint, text string, y int")


def test_logreg_portable_matches_pure_python(spark):
    """The Spark fixed-point trainer and the pure-Python mirror (_tdiv
    arithmetic) must produce IDENTICAL integer weights epoch for epoch
    — any div-semantics or ordering slip shows up as inequality."""
    d = _separable_docs(spark)
    xf = C.portable_feature_frame(d, "y")
    w_spark = C.logreg_portable_train(xf, epochs=4)
    rows = [
        (int(r["_y"]), [int(r["_x0"]), int(r["_x1"]), int(r["_x2"])])
        for r in xf.collect()
    ]
    w_py = C.logreg_portable_py(rows, epochs=4)
    assert w_spark == w_py
    # and the trained model separates the corpus it trained on
    out = C.logreg_portable_score_frame(xf, w_spark).collect()
    acc = sum(1 for r in out if r["pred"] == r["y"]) / len(out)
    assert acc >= 0.95
    # p_fp stays in fixed-point range
    assert all(0 <= r["p_fp"] <= C.Q_FP for r in out)


def test_logreg_portable_zero_epochs_is_half(spark):
    """Zero epochs → zero weights → hard sigmoid at exactly Q/2 for
    every doc (and pred = 1 by the >= half cut) — the documented
    starting point both engines share."""
    d = _separable_docs(spark, n=10)
    xf = C.portable_feature_frame(d, "y")
    w = C.logreg_portable_train(xf, epochs=0)
    assert w == [0, 0, 0]
    out = C.logreg_portable_score_frame(xf, w).collect()
    assert all(r["p_fp"] == C.Q_FP // 2 and r["pred"] == 1 for r in out)


def test_logreg_float_heldout_auc(spark):
    """Float tier: train on ~2/3 of a separable corpus, score the held
    OUT third, assert rank-based AUC — the statistical gate the
    rows-only q_lm_classifier row points at."""
    d = _separable_docs(spark, n=150)
    train = d.filter(F.col("doc_id") % 3 != 0)
    held = d.filter(F.col("doc_id") % 3 == 0)
    w = C.logreg_train(train, F.col("y"), epochs=15, lr=1.0)
    assert len(w) == 4
    scored = held.select(
        C.logreg_score(w).alias("s"), F.col("y")
    )
    auc = C.auc_score(scored, "s", "y")
    assert auc >= 0.9, auc
    with pytest.raises(ValueError, match="epochs"):
        C.logreg_train(d, F.col("y"), epochs=0)
    with pytest.raises(ValueError, match="weights"):
        C.logreg_score([0.0, 1.0])


def test_auc_degenerate_single_class(spark):
    """AUC over a single-class frame is NaN, not a crash."""
    import math

    d = spark.createDataFrame([(0.9, 1), (0.1, 1)], "s double, y int")
    assert math.isnan(C.auc_score(d, "s", "y"))


def test_token_budget_accepts_learned_score(spark):
    """token_budget_threshold's quality_col hook: the learned scorer
    replaces the heuristic, the bin-granular budget semantics hold
    (threshold reproduces the kept set as a filter on the SAME score),
    and token counting still comes from the text column."""
    from mesin_spark.ext import pipeline as P
    from mesin_spark.ext.text import token_count
    from mesin_spark.functions import stable_round as R

    d = _separable_docs(spark)
    xf = C.portable_feature_frame(d, "y")
    w = C.logreg_portable_train(xf, epochs=3)
    scored = d.join(
        C.logreg_portable_score_frame(xf, w).select("doc_id", "p_fp"), "doc_id"
    )
    q = F.col("p_fp").cast("double") / F.lit(float(C.Q_FP))
    half = P.token_budget_threshold(
        scored, budget_frac=0.5, quality_col=q
    ).head()
    assert half["total_docs"] == 120
    budget = 0.5 * half["total_tokens"]
    assert half["kept_tokens"] >= budget
    thr = half["threshold"]
    kept = (
        scored.select(R(q, 6).alias("qb"), token_count(F.col("text")).alias("t"))
        .filter(F.col("qb") >= thr)
        .agg(F.count(F.lit(1)).alias("d"), F.sum("t").alias("t"))
        .head()
    )
    assert (kept["d"], kept["t"]) == (half["kept_docs"], half["kept_tokens"])
    # the learned threshold keeps the high-quality (label-1) tokens:
    # label-1 docs are the long stopword-heavy half, so a half-token
    # budget on the learned score must keep only label-1 bins
    top = scored.filter(R(q, 6) >= thr)
    assert top.filter(F.col("y") == 0).count() == 0
