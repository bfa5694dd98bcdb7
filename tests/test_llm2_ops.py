"""Quality assertions for the round-2 pipeline operators — planted-case
checks the value-hash oracle can't express: repetition ordering, guaranteed
decontamination hits, Bloom no-false-negatives, packing invariants, mixture
algebra, radius⊇top-k consistency, frame-exact video decode."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mesin_spark.ext import dedup as D
from mesin_spark.ext import multimodal as M
from mesin_spark.ext import pipeline as P
from mesin_spark.ext import similarity as S
from mesin_spark.ext import text as TX
from mesin_spark.queries import T
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return T(spark, SF_DIR, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    return T(spark, SF_DIR, "embeddings")


# -- repetition signals -----------------------------------------------------
def test_repetition_orders_boilerplate_above_prose(spark):
    df = spark.createDataFrame(
        [
            (1, "buy now buy now buy now buy now buy now"),
            (2, "the quick brown fox jumps over a lazy dog near riverbanks"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in df.select("doc_id", *TX.repetition_signals("text")).collect()}
    assert rows[1].dup_token_ratio > rows[2].dup_token_ratio
    assert rows[1].top_bigram_ratio > rows[2].top_bigram_ratio
    # 'buy now' ×5: 2 distinct of 10 tokens; 'buy now' is 5 of 9 bigrams
    assert rows[1].dup_token_ratio == pytest.approx(0.8)
    assert rows[1].top_bigram_ratio == pytest.approx(5 / 9, abs=1e-6)


def test_repetition_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "single"), (3, "two words")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in df.select("doc_id", *TX.repetition_signals("text")).collect()}
    assert rows[1].dup_token_ratio == 0.0 and rows[1].top_bigram_ratio == 0.0
    assert rows[2].top_bigram_ratio == 0.0  # one token → no bigrams
    assert rows[3].top_bigram_ratio == 1.0  # exactly one bigram


# -- decontamination --------------------------------------------------------
def test_contamination_flags_planted_leak(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # contains the benchmark 5-gram "beta gamma delta epsilon zeta"
            (1, "prefix words beta gamma delta epsilon zeta suffix here"),
            (2, "totally unrelated content about distributed query engines"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.contaminated for r in D.contamination_flags(train, bench, "doc_id").collect()}
    assert out == {1: True, 2: False}


# -- Bloom filter -----------------------------------------------------------
def test_bloom_no_false_negatives_and_bounded_fp(spark, docs):
    corpus = docs.select("doc_id")
    members = corpus.filter(F.col("doc_id") % 7 == 0)
    out = D.bloom_member_flags(corpus, members, "doc_id", m=4096, k=3).collect()
    fn = [r.doc_id for r in out if r.doc_id % 7 == 0 and not r.might_contain]
    assert fn == []  # Bloom guarantee: zero false negatives
    n_nonmember = sum(1 for r in out if r.doc_id % 7 != 0)
    fp = sum(1 for r in out if r.doc_id % 7 != 0 and r.might_contain)
    # 500 docs → ~71 members → kn/m ≈ 0.05 → fp rate well under 5%
    assert fp / n_nonmember < 0.05


def test_bloom_plan_is_mapside(spark, docs):
    out = D.bloom_member_flags(
        docs.select("doc_id"), docs.select("doc_id").limit(10), "doc_id"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # probe is pure map-side codegen


# -- sequence packing -------------------------------------------------------
def test_pack_sequences_invariants(spark, docs):
    chunks = P.chunk_documents(docs, chunk_tokens=64, stride=48)
    packed = P.pack_sequences(chunks, capacity=512, n_shards=4).collect()
    assert all(0 <= r.bin_offset < 512 for r in packed)
    # per shard: offsets are the running token stream cut at 512 boundaries
    by_shard: dict[int, list] = {}
    for r in packed:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: (r.doc_id, r.chunk_id))
        start = 0
        for r in rows:
            assert r.bin_id == start // 512
            assert r.bin_offset == start % 512
            start += r.n_tokens


# -- domain mixture ---------------------------------------------------------
def test_domain_mixture_algebra(spark, docs):
    out = P.domain_mixture(docs).collect()
    shares = [r.token_share for r in out]
    assert sum(shares) == pytest.approx(1.0, abs=1e-4)
    n = len(out)
    for r in out:
        # weight × share ≈ uniform target share
        assert r.mix_weight * r.token_share == pytest.approx(1.0 / n, abs=1e-4)
    # explicit target overrides uniform
    t = {out[0].domain: 1.0}
    out2 = {r.domain: r for r in P.domain_mixture(docs, target=t).collect()}
    assert out2[out[0].domain].mix_weight > 0
    others = [r for d, r in out2.items() if d != out[0].domain]
    assert all(r.mix_weight == 0.0 for r in others)


def test_domain_temperature_upweights_rare(spark):
    """T=0.5 smoothing: a rare domain's sampling share rises above its
    token share (mix_weight > 1), a dominant domain's falls (< 1), the
    smoothed shares stay a distribution, T→1 degenerates toward the raw
    shares, and the pinned-T path is deterministic across runs."""
    rows = [(i, "tok " * 99 + "tok", "big") for i in range(90)]
    rows += [(1000 + i, "tok " * 99 + "tok", "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.domain: r for r in P.domain_mixture_temperature(df).collect()}
    assert out["big"].token_share == pytest.approx(0.9, abs=1e-6)
    assert out["small"].mix_weight > 1.0 > out["big"].mix_weight
    total_fp = sum(r.sample_fp for r in out.values())
    assert abs(total_fp - 1_000_000) <= len(out)  # trunc-div remainder only
    # smoothed shares sit between raw share and uniform
    assert 0.1 < out["small"].sample_fp / 1e6 < 0.5
    # general-T pow path: T→1 reproduces the raw shares (within rounding)
    near1 = {r.domain: r for r in
             P.domain_mixture_temperature(df, temperature=0.999).collect()}
    assert near1["small"].sample_fp / 1e6 == pytest.approx(0.1, abs=5e-3)
    again = {r.domain: r for r in P.domain_mixture_temperature(df).collect()}
    assert {d: (r.sample_fp, r.mix_weight) for d, r in out.items()} == {
        d: (r.sample_fp, r.mix_weight) for d, r in again.items()
    }


def test_domain_temperature_zero_token_domains(spark):
    """Zero-token domains must surface as 0-weight rows, not NaN/NULL
    (ADVICE r07: _share=0 made mix_weight = sample_fp/0 = NaN; an
    all-empty corpus additionally made _tot=0 and _wsum=0)."""
    import math

    rows = [(0, "tok tok tok", "live"), (1, "", "empty"), (2, "", "empty")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.domain: r for r in P.domain_mixture_temperature(df).collect()}
    assert out["empty"].n_tokens == 0
    assert out["empty"].token_share == 0.0
    assert out["empty"].sample_fp == 0
    assert out["empty"].mix_weight == 0.0  # not NaN
    assert out["live"].sample_fp == 1_000_000  # whole smoothed mass
    for r in out.values():
        assert r.mix_weight is not None and not math.isnan(r.mix_weight)
    # degenerate all-empty corpus: every stage guarded, all-zero output
    allz = spark.createDataFrame(
        [(0, "", "a"), (1, "", "b")], "doc_id long, text string, source string"
    )
    zout = P.domain_mixture_temperature(allz).collect()
    assert len(zout) == 2
    for r in zout:
        assert (r.token_share, r.sample_fp, r.mix_weight) == (0.0, 0, 0.0)


# -- radius search ----------------------------------------------------------
def test_radius_contains_topk_above_radius(spark, emb):
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    topk = S.brute_force_topk(emb, qvec, k=10).collect()
    radius = 0.25
    in_radius = {r.vec_id for r in S.radius_search(emb, qvec, radius=radius).collect()}
    for r in topk:
        if r.sim >= radius:
            assert r.vec_id in in_radius
    # every radius hit really is ≥ radius (exactness)
    sims = {r.vec_id: r.sim for r in S.radius_search(emb, qvec, radius=radius).collect()}
    assert all(s >= radius for s in sims.values())


# -- video codec ------------------------------------------------------------
def test_video_roundtrip_exact():
    frames = [
        (np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3) + i) % 256
        for i in range(5)
    ]
    payload = M.make_video_payload([f.astype(np.uint8) for f in frames])
    decoded = M.decode_video(payload)
    assert len(decoded) == 5
    for orig, dec in zip(frames, decoded):
        assert np.array_equal(orig.astype(np.uint8), dec)


def test_frame_sample_spark_path(spark, docs):
    d = docs.limit(20)
    out = M.frame_sample(M.synth_video(d, n_frames=10), every_n=4).collect()
    assert len(out) == 20
    for r in out:
        assert r.n_frames == 10
        assert r.n_sampled == 3  # frames 0, 4, 8
        # sampled frames decode back to real P6 images with exact means
        for fb, mean in zip(r.frames, r.frame_means):
            px, meta = M.decode_ppm(bytes(fb))
            assert (meta["width"], meta["height"]) == (8, 6)
            assert float(px.mean()) == pytest.approx(mean, abs=1e-9)


def test_frame_sample_deterministic(spark, docs):
    d = docs.limit(5)
    a = M.frame_sample(M.synth_video(d), every_n=3).collect()
    b = M.frame_sample(M.synth_video(d), every_n=3).collect()
    assert [(r.doc_id, r.frame_means) for r in a] == [(r.doc_id, r.frame_means) for r in b]


def test_avi_mjpeg_container_roundtrip():
    """AVI/MJPEG codec: deterministic bytes, exact frame count and
    header metadata, per-frame PSNR above usable thresholds, and the
    container-agnostic decode_video dispatch."""
    from mesin_spark.ext.avi import decode_avi, make_avi_payload

    def psnr(a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)

    yy, xx = np.mgrid[0:24, 0:32]
    frames = [
        np.stack(
            [(yy * 3 + t * 10) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256],
            axis=-1,
        ).astype(np.uint8)
        for t in range(5)
    ]
    avi = make_avi_payload(frames, fps=10, quality=90)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    assert make_avi_payload(frames, fps=10, quality=90) == avi
    dec, meta = decode_avi(avi)
    assert (meta["width"], meta["height"], meta["fps"], meta["n_frames"]) == (
        32, 24, 10.0, 5,
    )
    assert len(dec) == 5
    assert all(psnr(a, b) > 40 for a, b in zip(frames, dec))
    # decode_video dispatches on the RIFF magic
    assert len(M.decode_video(avi)) == 5
    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x00\x00\x00\x00WAVE")  # RIFF but not AVI
    # grayscale MJPEG frames broadcast to (h, w, 3) — decode_video's
    # contract; a 2D frame would corrupt make_ppm_payload downstream
    gavi = make_avi_payload(
        [np.full((16, 16), 100 + t, np.uint8) for t in range(3)]
    )
    gdec, _ = decode_avi(gavi)
    assert all(f.shape == (16, 16, 3) for f in gdec)
    M.decode_ppm(M.make_ppm_payload(gdec[0]))  # round-trips cleanly


def test_video_mjpeg_transcode_spark_path(spark, docs):
    """Transcode MPPM → AVI/MJPEG in Spark: frame counts exact through
    the lossy re-encode, means within JPEG quantization error of the
    raw path, and the AVI strictly smaller than raw frames at this
    geometry."""
    d = docs.limit(10)
    raw = M.frame_sample(M.synth_video(d, width=32, height=24), every_n=3)
    avi = M.transcode_video_to_mjpeg(
        M.synth_video(d, width=32, height=24), quality=90
    )
    assert avi.agg({"ratio": "max"}).collect()[0][0] < 1.0
    jp = M.frame_sample(avi.select("doc_id", "payload"), every_n=3)
    a = {r.doc_id: r for r in raw.collect()}
    b = {r.doc_id: r for r in jp.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k].n_frames == b[k].n_frames
        assert a[k].n_sampled == b[k].n_sampled
        for ma, mb in zip(a[k].frame_means, b[k].frame_means):
            assert abs(ma - mb) < 3.0  # JPEG quantization bound


# -- minhash numpy/fold equivalence ----------------------------------------
def test_minhash_numpy_matches_fold(spark, docs):
    from mesin_spark.ext.dedup import (
        _hashed_shingle_frame,
        minhash_signature_from_hashes,
        minhash_signature_numpy,
    )

    hashed = _hashed_shingle_frame(docs.limit(100), "doc_id", "text", 3)
    fold = {
        r._id: list(r.s)
        for r in hashed.select(
            "_id", minhash_signature_from_hashes(F.col("_h"), 64).alias("s")
        ).collect()
    }
    np_ = {
        r._id: list(r.s)
        for r in hashed.select(
            "_id", minhash_signature_numpy(64)(F.col("_h")).alias("s")
        ).collect()
    }
    assert fold == np_  # bit-identical signatures, both paths


# -- count-min sketch -------------------------------------------------------
def test_cms_never_underestimates(spark, docs):
    from mesin_spark.ext import sketches as SK

    toks = docs.select(F.explode(TX.tokens("text")).alias("tok"))
    true = {r.tok: r.n for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()}
    sketch = SK.cms_build(toks, w=256, d=4)
    qdf = spark.createDataFrame([(t,) for t in list(true)[:200]], "tok string")
    est = {r.tok: r.est_n for r in SK.cms_estimate(sketch, qdf, w=256, d=4).collect()}
    assert all(est[t] >= true[t] for t in est)  # CMS guarantee
    # small vocab vs 1024 counters: most estimates exact
    exact = sum(1 for t in est if est[t] == true[t])
    assert exact / len(est) > 0.5


def test_cms_merges_by_addition(spark, docs):
    from mesin_spark.ext import sketches as SK

    toks = docs.select(F.explode(TX.tokens("text")).alias("tok"))
    a, b = toks.limit(2000), toks.offset(2000)
    merged = (
        SK.cms_build(a, w=128, d=2)
        .union(SK.cms_build(b, w=128, d=2))
        .groupBy("row", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = SK.cms_build(toks, w=128, d=2)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in whole.collect()}


# -- sessionize vs session_window consistency ------------------------------
def test_sessionize_matches_session_window_counts(spark):
    from mesin_spark.queries.events import q_session_batch
    from mesin_spark.queries.sql_menu2 import q_sessionize

    sf = SF_DIR
    per_event = q_sessionize(spark, sf)
    n_sessions = (
        per_event.groupBy("user_id")
        .agg(F.countDistinct("session_no").alias("n"))
        .collect()
    )
    windowed = q_session_batch(spark, sf).groupBy("user_id").count().collect()
    a = {r.user_id: r.n for r in n_sessions}
    b = {r.user_id: r["count"] for r in windowed}
    assert a == b  # lag+cumsum labels and session_window agree per user


def test_apply_mixture_up_and_downsamples(spark):
    docs = spark.createDataFrame(
        [(i, "big" if i < 800 else "small") for i in range(1000)],
        "doc_id long, source string",
    )
    weights = spark.createDataFrame(
        [("big", 0.25), ("small", 2.5)], "domain string, mix_weight double"
    )
    out = P.apply_mixture(docs, weights).collect()
    big = [r for r in out if r.source == "big"]
    small = [r for r in out if r.source == "small"]
    # downsample: ~25% of 800 kept, exactly one copy each
    assert 150 <= len(big) <= 250 and all(r.copy_no == 1 for r in big)
    # upsample: every small doc keeps 2 or 3 copies, ~2.5x overall
    per_doc = {}
    for r in small:
        per_doc.setdefault(r.doc_id, []).append(r.copy_no)
    assert all(sorted(v) in ([1, 2], [1, 2, 3]) for v in per_doc.values())
    assert len(per_doc) == 200  # upsampling never drops a doc
    assert 450 <= len(small) <= 550


def test_lm_score_ranks_fluent_above_scrambled(spark, docs):
    base = docs.select("doc_id", "text").limit(50)
    first = base.head()
    words = first.text.lower().split()
    scrambled = " ".join(words[::2][::-1] + words[1::2])  # unseen bigrams
    probes = spark.createDataFrame(
        [(900001, first.text), (900002, scrambled)], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.lm_score
        for r in TX.bigram_lm_scores(base.union(probes)).collect()
    }
    # a verbatim corpus doc has frequent bigrams; the scrambled version of
    # the same words has mostly unseen ones
    assert out[900001] > out[900002]


def test_dbscan_planted_geometry(spark):
    import math

    from mesin_spark.ext.similarity import dbscan

    def vec(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    # blob A at 0-6deg (ids 1-4, mutually within eps=0.9 ~= 25.8deg, 3
    # neighbors each -> cores), border id 5 at 28deg (reaches only 4deg
    # and 6deg -> 2 neighbors < min_pts, both core -> border, adopts A's
    # min id), blob B at 90-96deg (ids 6-9 -> cores), noise id 10 at
    # 60deg (no neighbor at all)
    rows = [
        (1, vec(0)), (2, vec(2)), (3, vec(4)), (4, vec(6)),
        (5, vec(28)),
        (6, vec(90)), (7, vec(92)), (8, vec(94)), (9, vec(96)),
        (10, vec(60)),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = {
        r["node"]: (r["cluster_id"], r["role"])
        for r in dbscan(df, eps=0.9, min_pts=3).collect()
    }
    assert got == {
        1: (1, "core"), 2: (1, "core"), 3: (1, "core"), 4: (1, "core"),
        5: (1, "border"),
        6: (6, "core"), 7: (6, "core"), 8: (6, "core"), 9: (6, "core"),
    }  # id 10 is noise -> absent


def test_mp4_mjpeg_container_roundtrip():
    """MP4/MJPEG codec (ISO BMFF, ext/mp4.py): deterministic bytes, exact
    frame count + header metadata via the standard sample tables, pixel
    IDENTITY with the AVI route (same JPEG codec), grayscale broadcast,
    h264 refusal, and the decode_video ftyp dispatch."""
    import pytest

    from mesin_spark.ext.avi import make_avi_payload, decode_avi
    from mesin_spark.ext.mp4 import decode_mp4, make_mp4_payload

    yy, xx = np.mgrid[0:24, 0:32]
    frames = [
        np.stack(
            [(yy * 3 + t * 10) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256],
            axis=-1,
        ).astype(np.uint8)
        for t in range(5)
    ]
    mp4 = make_mp4_payload(frames, fps=10, quality=90)
    assert mp4[4:8] == b"ftyp"
    assert make_mp4_payload(frames, fps=10, quality=90) == mp4
    dec, meta = decode_mp4(mp4)
    assert (meta["width"], meta["height"], meta["fps"], meta["n_frames"]) == (
        32, 24, 10.0, 5,
    )
    # same JPEG codec underneath: MP4 and AVI routes decode IDENTICAL pixels
    adec, _ = decode_avi(make_avi_payload(frames, fps=10, quality=90))
    assert all(np.array_equal(a, b) for a, b in zip(adec, dec))
    # decode_video dispatches on the ftyp box
    assert len(M.decode_video(mp4)) == 5
    # grayscale samples broadcast to (h, w, 3) per decode_video's contract
    gmp4 = make_mp4_payload(
        [np.full((16, 16), 100 + t, np.uint8)[..., None].repeat(3, -1) for t in range(3)]
    )
    gdec, _ = decode_mp4(gmp4)
    assert all(f.shape == (16, 16, 3) for f in gdec)
    # h264 sample entry: container parses, codec refuses loudly
    # (patch the LAST 'jpeg' occurrence — the stsd entry lives in the
    # trailing moov; an earlier hit could be entropy bytes in mdat)
    i = mp4.rindex(b"jpeg")
    with pytest.raises(NotImplementedError, match="native"):
        decode_mp4(mp4[:i] + b"avc1" + mp4[i + 4 :])
    with pytest.raises(ValueError):
        decode_mp4(b"\x00\x00\x00\x08free")


def test_mp4_broken_first_video_track_falls_through():
    """Round-7 review regression (ADVICE probe.py:496): a 'vide' track
    missing its sample tables (stsd/stsz) must be SKIPPED in favor of a
    later well-formed video track — in the prober AND the decoder,
    which share video_track_tables. Built by splicing a sample-table-
    less fake trak at the head of a real file's moov (moov trails mdat
    in make_mp4_payload's layout, so stco offsets stay valid)."""
    import struct

    from mesin_spark.ext.mp4 import _box, _find_box, decode_mp4, make_mp4_payload
    from mesin_spark.ext.probe import probe_media

    frames = [np.full((16, 16, 3), 40 * t, np.uint8) for t in range(3)]
    mp4 = make_mp4_payload(frames, fps=10, quality=90)
    # fake video trak: hdlr 'vide' + mdhd(timescale=999) + empty stbl
    hdlr = _box(
        b"hdlr",
        struct.pack(">I", 0) * 2 + b"vide" + b"\x00" * 12 + b"X\x00",
    )
    mdhd = _box(b"mdhd", struct.pack(">IIIII", 0, 0, 0, 999, 0))
    minf = _box(b"minf", _box(b"stbl", b""))
    bad_trak = _box(b"trak", _box(b"mdia", mdhd + hdlr + minf))
    m0, m1 = _find_box(mp4, 0, len(mp4), [b"moov"])
    spliced = mp4[: m0 - 8] + _box(b"moov", bad_trak + mp4[m0:m1]) + mp4[m1:]
    meta = probe_media(spliced)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (16, 16, 3)
    assert meta["fps"] == 10.0  # the GOOD track's timescale, not 999
    dec, _ = decode_mp4(spliced)
    assert len(dec) == 3


def test_video_mp4_transcode_spark_path(spark, docs):
    """Transcode MPPM → MP4/MJPEG in Spark: frame counts exact through
    the lossy re-encode, pixel parity with the AVI container route, and
    a truncated MP4 payload flags per-record instead of killing the job."""
    d = docs.limit(10)
    avi = M.transcode_video_to_mjpeg(
        M.synth_video(d, width=32, height=24), quality=90, container="avi"
    )
    mp4 = M.transcode_video_to_mjpeg(
        M.synth_video(d, width=32, height=24), quality=90, container="mp4"
    )
    assert mp4.agg({"ratio": "max"}).collect()[0][0] < 1.0
    a = {r.doc_id: r for r in M.frame_sample(avi.select("doc_id", "payload"), every_n=3).collect()}
    b = {r.doc_id: r for r in M.frame_sample(mp4.select("doc_id", "payload"), every_n=3).collect()}
    assert set(a) == set(b)
    for i in a:
        assert a[i].n_frames == b[i].n_frames == 12
        assert a[i].frame_means == b[i].frame_means  # identical pixels
    # poison pill: truncate one mp4 payload — flagged row, job completes
    one = mp4.select("doc_id", "payload").limit(1).collect()[0]
    import pyspark.sql.functions as F

    bad = spark.createDataFrame(
        [(one.doc_id, bytearray(bytes(one.payload)[: len(one.payload) // 2]))],
        "doc_id long, payload binary",
    )
    rows = M.frame_sample(bad, every_n=3).collect()
    assert rows[0].error is not None and rows[0].n_frames is None


def test_avi_audio_first_stream_and_dropped_frames():
    """ADVICE r05: (1) a spec-valid AVI whose audio stream is listed
    first carries video as stream 1 ('01dc' chunks) — the reader derives
    the video stream index from strh order instead of assuming 0;
    (2) zero-length frame chunks (dropped-frame padding real capture
    files contain) are skipped, not fed to the JPEG decoder."""
    import struct

    from mesin_spark.ext.avi import decode_avi, make_avi_payload

    frames = [np.full((8, 8, 3), 50 + i, np.uint8) for i in range(3)]
    avi = make_avi_payload(frames, fps=5, quality=90)
    want = decode_avi(avi)[0]

    def _chunk(fourcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def _list(fourcc, body):
        return _chunk(b"LIST", fourcc + body)

    # inject an 'auds' strl BEFORE the vids strl and renumber the video
    # chunks 00dc -> 01dc: video is now stream 1
    auds_strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"auds", b"\x00\x00\x00\x00",
        0, 0, 0, 0, 1, 8000, 0, 100, 0, 0xFFFFFFFF, 0, 0, 0, 0, 0,
    )
    auds_strf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    auds_strl = _list(b"strl", _chunk(b"strh", auds_strh) + _chunk(b"strf", auds_strf))
    vs = avi.index(b"strl")
    list_start = avi.rindex(b"LIST", 0, vs)
    patched = avi[:list_start] + auds_strl + avi[list_start:]
    h0 = patched.index(b"LIST")
    (hsz,) = struct.unpack("<I", patched[h0 + 4 : h0 + 8])
    patched = patched[: h0 + 4] + struct.pack("<I", hsz + len(auds_strl)) + patched[h0 + 8 :]
    (rsz,) = struct.unpack("<I", patched[4:8])
    patched = patched[:4] + struct.pack("<I", rsz + len(auds_strl)) + patched[8:]
    patched = patched.replace(b"00dc", b"01dc")
    dec, _ = decode_avi(patched)
    assert len(dec) == 3
    assert all(np.array_equal(a, b) for a, b in zip(dec, want))

    # zero-length dropped-frame chunk: skipped, frame count unchanged
    z = avi.index(b"movi") + 4
    with_zero = avi[:z] + _chunk(b"00dc", b"") + avi[z:]
    (rsz,) = struct.unpack("<I", with_zero[4:8])
    with_zero = with_zero[:4] + struct.pack("<I", rsz + 8) + with_zero[8:]
    dec2, _ = decode_avi(with_zero)
    assert len(dec2) == 3


def test_media_probe_headers_only(spark, docs):
    """ext/probe.py: container metadata WITHOUT decoding — exact header
    values for all six payload families, plus per-record poison-pill
    flagging for unrecognized bytes."""
    from mesin_spark.ext.jpeg import make_jpeg_payload, make_progressive_jpeg_payload
    from mesin_spark.ext.mp4 import make_mp4_payload
    from mesin_spark.ext.probe import probe_media, probe_media_features

    px = np.full((24, 32, 3), 99, np.uint8)
    assert probe_media(make_jpeg_payload(px, 85)) == {
        "kind": "image", "codec": "jpeg-baseline", "width": 32, "height": 24,
        "n_channels": 3,
    }
    assert probe_media(make_progressive_jpeg_payload(px, 85))["codec"] == (
        "jpeg-progressive"
    )
    m = probe_media(make_mp4_payload([px] * 5, fps=10))
    assert (m["n_frames"], m["fps"], m["codec"]) == (5, 10.0, "jpeg")
    w = probe_media(M.make_wav_payload([100] * 8000, 8000))
    assert (w["sample_rate"], w["duration_s"]) == (8000, 1.0)

    # Spark path over a mixed batch with one poison payload
    rows = {
        r.doc_id: r
        for r in probe_media_features(
            spark.createDataFrame(
                [
                    (1, bytearray(make_jpeg_payload(px, 85))),
                    (2, bytearray(M.make_ppm_payload(px))),
                    (3, bytearray(b"certainly not media")),
                ],
                "doc_id long, payload binary",
            )
        ).collect()
    }
    assert rows[1].codec == "jpeg-baseline" and rows[1].error is None
    assert rows[2].codec == "ppm" and rows[2].width == 32
    assert rows[3].error is not None and rows[3].kind is None

    # registry query: each family probes to its own codec label
    import __spark_entry__ as E

    out = E.queries()["q_media_probe"](spark, SF_DIR).collect()
    assert len(out) == 120
    by_codec = {}
    for r in out:
        by_codec.setdefault(r.codec, 0)
        by_codec[r.codec] += 1
        assert r.doc_id % 6 == {
            "pcm": 0, "ppm": 1, "jpeg-baseline": 2, "jpeg-progressive": 3,
            "MJPG": 4, "jpeg": 5,
        }[r.codec]
    assert set(by_codec) == {
        "pcm", "ppm", "jpeg-baseline", "jpeg-progressive", "MJPG", "jpeg"
    }
