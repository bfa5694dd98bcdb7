"""Checkpoint-backend knob (ext/ckpt.py): local (executor blocks) vs
reliable (durable checkpoint dir) must be RESULT-IDENTICAL — the knob
trades recovery semantics, never values. On a real cluster the local
default dies with any executor holding truncated-lineage blocks; the
reliable backend is what a 1000-executor spot-node deployment runs."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _with_backend(spark, backend, dir=None):
    spark.conf.set("mesin.checkpoint.backend", backend)
    if dir:
        spark.conf.set("mesin.checkpoint.dir", dir)


def _reset(spark):
    spark.conf.unset("mesin.checkpoint.backend")


def test_checkpoint_backend_equivalence(spark, tmp_path):
    from mesin_spark.ext.dedup import dedup_clusters
    from mesin_spark.ext.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 4), (6, 4), (2, 1)],
        "src bigint, dst bigint",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (9, 9)], "id_a bigint, id_b bigint"
    )
    out = {}
    for backend in ("local", "reliable"):
        _with_backend(spark, backend, str(tmp_path / "ckpt"))
        try:
            out[backend] = (
                sorted(
                    (r["node"], round(r["rank"], 9))
                    for r in pagerank(edges, max_iter=6).collect()
                ),
                sorted(map(tuple, dedup_clusters(pairs).collect())),
            )
        finally:
            _reset(spark)
    assert out["local"] == out["reliable"]
    # the reliable pass must actually have written checkpoint data
    import os

    ckdir = str(tmp_path / "ckpt")
    assert os.path.isdir(ckdir) and any(os.scandir(ckdir))


def test_checkpoint_backend_rejects_unknown(spark):
    from mesin_spark.ext.ckpt import ckpt

    df = spark.range(3)
    _with_backend(spark, "hdfs")
    try:
        with pytest.raises(ValueError, match="checkpoint.backend"):
            ckpt(df)
    finally:
        _reset(spark)


def test_pinned_cache_keyed_and_bounded(spark):
    """The keyed registry (ext/pin.py) that replaced the per-tier
    module-global persist slots: identical projections share ONE pinned
    frame, distinct pipelines never evict each other (the round-9
    interleaving flag), and capacity eviction unpersists the oldest."""
    from mesin_spark.ext.pin import PinnedCache

    reg = PinnedCache(capacity=2)
    a = spark.range(10).selectExpr("id", "id * 2 AS v")
    b = spark.range(20).selectExpr("id", "id * 3 AS v")
    pa1 = reg.pin(a)
    pa2 = reg.pin(spark.range(10).selectExpr("id", "id * 2 AS v"))
    assert pa1 is pa2 and len(reg) == 1  # same semantics -> same pin
    pb = reg.pin(b)
    assert len(reg) == 2 and pb.storageLevel.useMemory
    c = reg.pin(spark.range(5))
    assert len(reg) == 2  # capacity eviction, oldest (a) dropped
    # evicted frame still computes correctly from lineage
    assert pa1.count() == 10 and c.count() == 5
    with pytest.raises(ValueError, match="capacity"):
        PinnedCache(capacity=0)
