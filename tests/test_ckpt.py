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


def test_pinned_cache_collision_falls_back(spark):
    """semanticHash is 32-bit: a key hit must be CONFIRMED with
    sameSemantics before it is returned (round-10 ADVICE). Simulate a
    collision by planting a DIFFERENT frame under the key and assert the
    registry detects the mismatch and pins the requested frame instead
    of answering with the impostor's data."""
    from mesin_spark.ext.pin import PinnedCache, _session_key

    reg = PinnedCache(capacity=4)
    a = spark.range(10).selectExpr("id", "id * 2 AS v")
    impostor = spark.range(99).selectExpr("id", "id * 7 AS v")
    key = (_session_key(a), a.semanticHash())
    with reg._lock:
        reg._entries[key] = impostor
    got = reg.pin(a)
    assert got.sameSemantics(a) and got.count() == 10
    with reg._lock:
        assert reg._entries[key] is got  # impostor slot reclaimed


def test_pinned_cache_thread_safety(spark):
    """Concurrent pins of the same and different frames must not race
    the registry bookkeeping (round-10 ADVICE: lock the OrderedDict)."""
    import threading

    from mesin_spark.ext.pin import PinnedCache

    reg = PinnedCache(capacity=4)
    frames = [spark.range(10 + i).selectExpr("id", f"id * {i + 2} AS v") for i in range(6)]
    errs = []

    def work(f):
        try:
            for _ in range(5):
                assert reg.pin(f).count() >= 10
        except Exception as e:  # pragma: no cover - failure reporter
            errs.append(e)

    ts = [threading.Thread(target=work, args=(f,)) for f in frames for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs and len(reg) <= 4


def test_same_ckpt_dir_boundary_and_authority():
    """Dir comparison must be by path COMPONENT with the authority
    stripped (round-11 ADVICE): /data/ckpt_old is not a child of
    /data/ckpt, and hdfs://nn:8020/... must match the authority-less
    hdfs:///... conf form instead of warning every call."""
    from mesin_spark.ext.ckpt import _same_ckpt_dir

    # a sibling sharing a string prefix is NOT the same dir
    assert not _same_ckpt_dir("file:/data/ckpt_old/u1", "/data/ckpt")
    assert not _same_ckpt_dir("/a/bc", "/a/b")
    # the timestamped child Spark creates IS
    assert _same_ckpt_dir("file:/tmp/mesin_ckpt/u1", "/tmp/mesin_ckpt")
    assert _same_ckpt_dir("/a/b", "/a/b/")
    # authority-qualified getCheckpointDir vs authority-less conf
    assert _same_ckpt_dir("hdfs://nn:8020/ckpt/mesin/u1", "hdfs:///ckpt/mesin")
    assert _same_ckpt_dir("hdfs://nn:8020/ckpt/mesin", "hdfs:///ckpt/mesin")
    assert not _same_ckpt_dir("hdfs://nn:8020/ckpt/old", "hdfs:///ckpt/mesin")


def test_pinned_cache_race_converges_on_one_entry(spark):
    """Two threads that both miss and both persist serialize at the
    insert (round-11 ADVICE): because Spark's CacheManager keys the
    cache by canonicalized plan, the two equal-plan persists share ONE
    cache entry — the registry must keep the incumbent and hand it to
    the loser (unpersisting either side would evict the shared entry
    for both). A barrier inside persist() holds both threads past the
    miss-check so the race is deterministic."""
    import threading

    from pyspark.sql import DataFrame

    from mesin_spark.ext.pin import PinnedCache

    reg = PinnedCache(capacity=4)
    frames = [spark.range(40).selectExpr("id", "id * 11 AS v") for _ in range(2)]
    bar = threading.Barrier(2, timeout=30)
    orig = DataFrame.persist
    errs, rets = [], {}

    def gated_persist(self, *a, **k):
        r = orig(self, *a, **k)
        bar.wait()  # both threads persisted before either inserts
        return r

    def work(i, f):
        try:
            rets[i] = reg.pin(f)
        except Exception as e:  # pragma: no cover - failure reporter
            errs.append(e)

    DataFrame.persist = gated_persist
    try:
        ts = [threading.Thread(target=work, args=(i, f))
              for i, f in enumerate(frames)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    finally:
        DataFrame.persist = orig
    assert not errs and len(reg) == 1
    # both callers converge on the SAME pinned frame (the incumbent),
    # and the shared cache entry survives
    assert rets[0] is rets[1]
    assert rets[0].storageLevel.useMemory
    with reg._lock:
        assert next(iter(reg._entries.values())) is rets[0]
    # a later pin of an equal frame still returns the single incumbent
    assert reg.pin(spark.range(40).selectExpr("id", "id * 11 AS v")) is rets[0]


def test_reliable_ckpt_dir_change_takes_effect(spark, tmp_path):
    """Changing mesin.checkpoint.dir mid-session must be honored (with a
    warning), not silently ignored (round-10 ADVICE)."""
    import os
    import warnings as w

    from mesin_spark.ext.ckpt import ckpt

    d1, d2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")
    _with_backend(spark, "reliable", d1)
    try:
        ckpt(spark.range(4))
        assert os.path.isdir(d1)
        spark.conf.set("mesin.checkpoint.dir", d2)
        with w.catch_warnings(record=True) as rec:
            w.simplefilter("always")
            ckpt(spark.range(5))
        assert any("mesin.checkpoint.dir changed" in str(r.message) for r in rec)
        assert os.path.isdir(d2) and any(os.scandir(d2))
    finally:
        _reset(spark)
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ck_reset"))
