"""Round-2 training-data pipeline operators (SURVEY.md §2.11 extension
tier): repetition quality signals, benchmark decontamination, Bloom-filter
membership, sequence packing, domain mixture weighting, radius similarity
search, and real video frame sampling.

Everything except the video path is deterministic closed-form arithmetic,
so each query carries an exact DuckDB oracle. The video query is rows-only
(binary codec path); its frame-exactness is asserted in
tests/test_llm2_ops.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mesin_spark.ext import dedup as D
from mesin_spark.ext import multimodal as M
from mesin_spark.ext import pipeline as P
from mesin_spark.ext import similarity as S
from mesin_spark.ext import text as TX
from mesin_spark.queries import R, T, query
from mesin_spark.ext.similarity import query_vector

#: DuckDB fragment: whitespace tokens of lower(text), empties dropped —
#: mirror of mesin_spark.ext.text.tokens.
_TK = "list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)"


@query(
    "q_quality_repetition",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TK} AS tk FROM documents),
    g AS (
        SELECT doc_id, tk,
               CASE WHEN len(tk) >= 2
                    THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
                    ELSE CAST([] AS VARCHAR[]) END AS gg
        FROM t
    )
    SELECT doc_id,
           floor((CASE WHEN len(tk) > 0
                       THEN 1.0 - len(list_distinct(tk))::DOUBLE / len(tk)
                       ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS dup_token_ratio,
           floor((CASE WHEN len(gg) > 0
                       THEN list_max(list_transform(list_distinct(gg),
                                x -> len(list_filter(gg, y -> y = x))))::DOUBLE / len(gg)
                       ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS top_bigram_ratio
    FROM g
    """,
)
def q_quality_repetition(spark, sf_dir):
    """Gopher-style repetition signals per document: duplicate-token ratio
    and top-bigram coverage — the standard boilerplate/templated-text
    filters. Pure map-side higher-order functions. The repartition exists
    only because one small parquet file arrives as one input partition
    locally (measured 12.9s single-core → sub-second spread at sf0.1); a
    real corpus has thousands of splits and needs no shuffle here."""
    d = T(spark, sf_dir, "documents")
    spread = d.repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
    return spread.select("doc_id", *TX.repetition_signals("text"))


@query(
    "q_decontaminate",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TK} AS tk FROM documents),
    g AS (
        SELECT doc_id,
               CASE WHEN len(tk) >= 5
                    THEN list_distinct(list_transform(range(1, len(tk) - 3),
                         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4]))
                    ELSE [array_to_string(tk, ' ')] END AS g
        FROM tk
    ),
    bench AS (SELECT doc_id, g FROM g WHERE doc_id % 97 = 0),
    train AS (
        SELECT doc_id, g FROM g WHERE doc_id % 97 <> 0
        UNION ALL
        SELECT doc_id + 1000000000000, g FROM bench
    ),
    bgrams AS (SELECT DISTINCT unnest(g) AS gram FROM bench),
    hit AS (
        SELECT DISTINCT doc_id
        FROM (SELECT doc_id, unnest(g) AS gram FROM train)
        WHERE gram IN (SELECT gram FROM bgrams)
    )
    SELECT t.doc_id, (h.doc_id IS NOT NULL) AS contaminated
    FROM train t LEFT JOIN hit h USING (doc_id)
    """,
)
def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: every 97th doc is the 'benchmark suite';
    the training corpus is the rest plus planted leaked copies of the
    benchmark (id+1e12). A doc is contaminated iff it shares any word
    5-gram with the benchmark — each planted copy MUST flag true."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0).union(
        bench.withColumn("doc_id", F.col("doc_id") + 1000000000000)
    )
    return D.contamination_flags(train, bench, "doc_id", n=5).orderBy("doc_id")


@query(
    "q_bloom_dedup",
    oracle="""
    WITH pos AS (
        SELECT DISTINCT unnest([
            (CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT)) % 4096,
            ((doc_id * 2246822519) % 4294967296) % 4096,
            ((doc_id * 3266489917) % 4294967296) % 4096]) AS p
        FROM documents WHERE doc_id % 7 = 0
    )
    SELECT doc_id,
           ((CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT)) % 4096 IN (SELECT p FROM pos)
            AND ((doc_id * 2246822519) % 4294967296) % 4096 IN (SELECT p FROM pos)
            AND ((doc_id * 3266489917) % 4294967296) % 4096 IN (SELECT p FROM pos)
           ) AS might_contain,
           (doc_id % 7 = 0) AS is_member
    FROM documents
    """,
)
def q_bloom_dedup(spark, sf_dir):
    """Approximate membership against a reference set (every 7th doc) via a
    distributed Bloom filter (m=4096 bits, k=3 portable hashes): zero false
    negatives guaranteed, false positives bounded — the map-side pre-filter
    for dedup-against-reference at 100 TB. The corpus-side probe is pure
    codegen arithmetic against an inlined m-bit set; no join, no shuffle."""
    docs = T(spark, sf_dir, "documents").select("doc_id")
    members = docs.filter(F.col("doc_id") % 7 == 0)
    return (
        D.bloom_member_flags(docs, members, "doc_id", m=4096, k=3)
        .withColumn("is_member", F.col("doc_id") % 7 == 0)
        .orderBy("doc_id")
    )


@query(
    "q_pack_sequences",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TK} AS tk FROM documents),
    s AS (
        SELECT doc_id, tk,
               range(0, greatest(ceil((len(tk) - 64) / 48.0), 0)::BIGINT + 1) AS starts
        FROM t
    ),
    chunks AS (
        SELECT doc_id, i AS chunk_id, least(len(tk) - i*48, 64) AS n_tokens,
               (CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT)) % 16 AS shard
        FROM s, unnest(starts) AS u(i)
    ),
    packed AS (
        SELECT doc_id, chunk_id, n_tokens, shard,
               sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id, chunk_id) - n_tokens AS strt
        FROM chunks
    )
    SELECT doc_id, chunk_id, shard,
           CAST(floor(strt / 512.0) AS BIGINT) AS bin_id,
           CAST(strt % 512 AS BIGINT) AS bin_offset,
           n_tokens
    FROM packed
    """,
)
def q_pack_sequences(spark, sf_dir):
    """Sequence packing for training batches: chunk the corpus (64/48),
    then concatenate-and-cut into 512-token bins, 16-way shard-parallel.
    Every chunk gets (shard, bin_id, bin_offset); deterministic and
    padding-free. One window shuffle, parallel across shards."""
    d = T(spark, sf_dir, "documents")
    chunks = P.chunk_documents(d, chunk_tokens=64, stride=48)
    return P.pack_sequences(chunks, capacity=512, n_shards=16).select(
        "doc_id", "chunk_id", "shard", "bin_id", "bin_offset", "n_tokens"
    )


@query(
    "q_domain_mix",
    oracle=f"""
    WITH s AS (
        SELECT source AS domain, count(*) AS n_docs,
               CAST(sum(len({_TK})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    )
    SELECT domain, n_docs, n_tokens,
           floor((n_tokens::DOUBLE / sum(n_tokens) OVER ()) * 1000000.0 + 0.5) / 1000000.0 AS token_share,
           floor(((1.0 / count(*) OVER ()) / (n_tokens::DOUBLE / sum(n_tokens) OVER ())) * 1000000.0 + 0.5) / 1000000.0 AS mix_weight
    FROM s
    """,
)
def q_domain_mix(spark, sf_dir):
    """Domain mixture statistics + resampling weights toward a uniform
    token mixture across sources — the corpus-rebalancing planner. One
    partial-agg groupBy; the window runs over the #domains-row result."""
    d = T(spark, sf_dir, "documents")
    return P.domain_mixture(d, domain_col="source").orderBy("domain")


@query(
    "q_domain_temperature",
    oracle=f"""
    WITH s AS (
        SELECT source AS domain, count(*) AS n_docs,
               CAST(sum(len({_TK})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    t AS (SELECT *, CAST(sum(n_tokens) OVER () AS BIGINT) AS tot FROM s),
    w AS (
        SELECT *, CAST(floor(sqrt(n_tokens::DOUBLE / tot) * 1000000.0 + 0.5) AS BIGINT) AS wfp
        FROM t
    ),
    n AS (SELECT *, CAST(sum(wfp) OVER () AS BIGINT) AS wsum FROM w)
    SELECT domain, n_docs, n_tokens,
           floor((n_tokens::DOUBLE / tot) * 1000000.0 + 0.5) / 1000000.0 AS token_share,
           CAST((wfp * 1000000) // wsum AS BIGINT) AS sample_fp,
           floor(((CAST((wfp * 1000000) // wsum AS DOUBLE) / 1000000.0)
                  / (n_tokens::DOUBLE / tot)) * 1000000.0 + 0.5) / 1000000.0 AS mix_weight
    FROM n ORDER BY domain
    """,
)
def q_domain_temperature(spark, sf_dir):
    """Temperature-smoothed domain mixture (sampling share ∝
    token_share^0.5 — the multilingual/GLaM up-weighting of rare
    domains; ext/pipeline.domain_mixture_temperature). T=0.5 is the
    pinned registry temperature because it makes the whole computation
    bit-portable: one correctly-rounded division for the share, an
    IEEE-exact sqrt (pow for general T is libm-dependent), fixed-point
    smoothing weights so the normalization sum is exact integers, and
    truncating integer division for the smoothed share — the oracle
    mirrors every step. One partial-agg groupBy + #domains-row
    windows; scales as a scan. Ref parity n/a (charter extension;
    reference has no text-pipeline surface)."""
    d = T(spark, sf_dir, "documents")
    return P.domain_mixture_temperature(d, domain_col="source").orderBy("domain")


@query(
    "q_apply_mixture",
    oracle=f"""
    WITH s AS (
        SELECT source AS domain, sum(len({_TK})) AS n_tokens
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT domain,
               floor(((1.0 / count(*) OVER ()) / (n_tokens::DOUBLE / sum(n_tokens) OVER ()))
                     * 1000000.0 + 0.5) / 1000000.0 AS mw
        FROM s
    ),
    j AS (
        SELECT d.doc_id, d.source,
               CAST(floor(mw) AS BIGINT)
               + CASE WHEN (CAST((CAST(d.doc_id + 3 AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT)) % 10000
                           < (mw - floor(mw)) * 10000
                      THEN 1 ELSE 0 END AS nc
        FROM documents d JOIN w ON d.source = w.domain
    )
    SELECT doc_id, source, CAST(u.i AS BIGINT) AS copy_no
    FROM j, unnest(range(1, nc + 1)) AS u(i)
    """,
)
def q_apply_mixture(spark, sf_dir):
    """Execute the mixture plan q_domain_mix produces: resample the corpus
    to a uniform token mixture — floor(w) copies per doc plus one more by
    deterministic hash bucket (handles up- AND down-sampling). Broadcast
    join + map-side explode; no corpus shuffle."""
    d = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    weights = P.domain_mixture(d).select("domain", "mix_weight")
    return P.apply_mixture(d.select("doc_id", "source"), weights).select(
        "doc_id", "source", "copy_no"
    )


@query(
    "q_sim_radius",
    oracle="""
    SELECT b.vec_id,
           floor((list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                                        CAST(q.embedding AS DOUBLE[]))) * 1000000.0 + 0.5) / 1000000.0 AS sim
    FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE floor((list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                                       CAST(q.embedding AS DOUBLE[]))) * 1000000.0 + 0.5) / 1000000.0 >= 0.25
    ORDER BY sim DESC NULLS LAST, b.vec_id ASC NULLS LAST
    """,
)
def q_sim_radius(spark, sf_dir):
    """Range similarity search: all vectors with cosine ≥ 0.25 of query
    vec_id=0 — the 'all near neighbors' companion to top-k. Single
    codegen'd scan + filter; no shuffle, no driver merge."""
    emb = T(spark, sf_dir, "embeddings")
    qvec = query_vector(emb, 0)
    return S.radius_search(emb, qvec, radius=0.25)


@query(
    "q_lm_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TK} AS tk FROM documents),
    bi AS (
        SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
        FROM t, unnest(range(1, len(tk))) AS u(i)
        WHERE len(tk) >= 2
    ),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
    c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
    v AS (SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(tk) AS tok FROM t))
    SELECT bi.doc_id, count(*) AS n_bigrams,
           floor(avg(ln((c12.c12 + 1.0) / (c1.c1 + 1.0 * v.v))) * 1000000.0 + 0.5)
               / 1000000.0 AS lm_score
    FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
    GROUP BY bi.doc_id
    """,
)
def q_lm_score(spark, sf_dir):
    """Perplexity-proxy quality filter: train an add-1-smoothed bigram LM
    on the corpus and score every document by its mean bigram
    log-probability — train + score in one declarative plan (two keyed
    count shuffles, broadcast vocabulary scalar, per-doc average)."""
    d = T(spark, sf_dir, "documents")
    return TX.bigram_lm_scores(d)


#: DuckDB fragment: polynomial token fingerprint (mirror of
#: sketches.token_fingerprint).
_FP = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split(tok, ''), c -> CAST(unicode(c) AS BIGINT))), "
    "(h, c) -> (h * 131 + c) % 1000000007)"
)


def _cms_oracle(w: int = 512) -> str:
    salts = (2654435761, 2246822519, 3266489917, 668265263)
    rows = "\nUNION ALL\n".join(
        f"SELECT {j} AS row, ((fp * {s}) % 4294967296) % {w} AS pos, n FROM all_fp"
        for j, s in enumerate(salts)
    )
    ests = ",\n".join(
        f"((fp * {s}) % 4294967296) % {w} AS p{j}" for j, s in enumerate(salts)
    )
    mins = ", ".join(
        f"(SELECT sum(n) FROM sketch s WHERE s.row = {j} AND s.pos = q.p{j})"
        for j in range(len(salts))
    )
    return f"""
    WITH toks AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  t -> len(t) > 0)) AS tok
        FROM documents
    ),
    counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
    all_fp AS (SELECT tok, n, {_FP} AS fp FROM counts),
    sketch AS ({rows}),
    heavy AS (SELECT tok, n AS true_n, fp FROM all_fp WHERE n >= 20),
    q AS (SELECT tok, true_n, {ests} FROM heavy)
    SELECT tok, true_n, CAST(least({mins}) AS BIGINT) AS est_n FROM q
    """


@query("q_countmin", oracle=_cms_oracle())
def q_countmin(spark, sf_dir):
    """Count-Min sketch frequency estimation: build a fixed d=4 × w=512
    counter table from the corpus token stream (one explode + one
    hash-agg; the sketch is ≤ 2048 rows no matter the corpus size and
    merges across shards by addition), then estimate the heavy tokens'
    counts as the min over their d counters — always ≥ the true count.
    Portable hashes make the estimates bit-reproducible in any engine."""
    from mesin_spark.ext import sketches as SK

    d_ = T(spark, sf_dir, "documents")
    toks = d_.select(F.explode(TX.tokens("text")).alias("tok"))
    true_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_n"))
    heavy = true_counts.filter(F.col("true_n") >= 20)
    sketch = SK.cms_build(toks, "tok", w=512, d=4)
    est = SK.cms_estimate(sketch, heavy.select("tok"), "tok", w=512, d=4)
    return heavy.join(est, "tok").select("tok", "true_n", "est_n")


@query(
    "q_quantize_embed",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               CAST(embedding AS DOUBLE[]) AS e,
               list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) / 127.0 AS scale
        FROM embeddings
    ),
    quant AS (
        SELECT vec_id, e, scale,
               list_transform(e, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS qv
        FROM q WHERE scale > 0
    )
    SELECT vec_id,
           floor(scale * 1000000.0 + 0.5) / 1000000.0 AS scale,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           floor((list_cosine_similarity(e, list_transform(qv, v -> v * scale)))
                 * 1000000.0 + 0.5) / 1000000.0 AS recon_cos
    FROM quant
    """,
)
def q_quantize_embed(spark, sf_dir):
    """Int8 embedding quantization (per-vector max-abs scale): 4× storage
    reduction for the ANN corpus at 100 TB, with the reconstruction
    cosine as the quality gate. All IEEE-deterministic arithmetic
    (identical divisions and floor-rounding in both engines), map-side
    only. Returns (vec_id, scale, q_sum, recon_cos ≈ 1)."""
    from mesin_spark.ext.similarity import _as_double, cosine

    emb = T(spark, sf_dir, "embeddings")
    e = _as_double(F.col("embedding"))
    scale = (F.array_max(F.transform(e, F.abs)) / 127.0).alias("scale")
    base = emb.select("vec_id", e.alias("e"), scale).filter(F.col("scale") > 0)
    qv = F.transform(F.col("e"), lambda x: F.floor(x / F.col("scale") + 0.5).cast("long"))
    quant = base.withColumn("qv", qv)
    dequant = F.transform(F.col("qv"), lambda v: v * F.col("scale"))
    return quant.select(
        "vec_id",
        R(F.col("scale"), 6).alias("scale"),
        F.aggregate("qv", F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        R(cosine(F.col("e"), dequant), 6).alias("recon_cos"),
    )


@query("q_multimodal_video")  # rows-only: real binary codec path (MPPM frames)
def q_multimodal_video(spark, sf_dir):
    """Real video frame-sampling end-to-end: synthesize a deterministic
    12-frame MPPM video per document (concatenated P6 frames — the
    codec-free MJPEG analogue), walk the self-describing frame headers,
    keep every 3rd frame, and emit per-frame mean pixel values — all in
    partition-preserving mapInPandas (binary in, features out, no
    shuffle). Frame-exact decode asserted in tests/test_llm2_ops.py."""
    # deterministic subset: a bare limit() takes whichever partitions
    # scan first, so the rows-only baseline row SET would depend on file
    # splits; doc_id is a stable filter at every SF
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sampled = M.frame_sample(M.synth_video(d), every_n=3)
    return sampled.select(
        "doc_id",
        "n_frames",
        "n_sampled",
        F.round(F.element_at("frame_means", 1), 6).alias("first_frame_mean"),
        F.round(F.element_at("frame_means", -1), 6).alias("last_frame_mean"),
    ).orderBy("doc_id")


@query("q_video_mjpeg")  # rows-only: lossy binary container path (no SQL analogue)
def q_video_mjpeg(spark, sf_dir):
    """Video pipeline through a REAL standard container: synthesize
    12-frame MPPM videos, transcode each to AVI/MJPEG (ext/avi.py — RIFF
    container, one baseline JPEG per frame, the storage-compaction step
    a raw-frame corpus runs at ingest), then frame-sample the AVI
    payloads through the same container-agnostic decode path. Frame
    counts are exact through the lossy re-encode; means shift only by
    JPEG quantization (bounded in tests/test_llm2_ops.py, alongside
    container round-trip and compression-ratio properties). All stages
    per-partition mapInPandas — no shuffle."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    avi = M.transcode_video_to_mjpeg(M.synth_video(d), fps=10, quality=90)
    sampled = M.frame_sample(avi.select("doc_id", "payload"), every_n=3)
    return sampled.select(
        "doc_id",
        "n_frames",
        "n_sampled",
        F.round(F.element_at("frame_means", 1), 2).alias("first_frame_mean"),
        F.round(F.element_at("frame_means", -1), 2).alias("last_frame_mean"),
    ).orderBy("doc_id")


@query("q_video_mp4")  # rows-only: lossy binary container path (no SQL analogue)
def q_video_mp4(spark, sf_dir):
    """Video pipeline through the ISO BMFF container family: synthesize
    12-frame MPPM videos, transcode each to MP4/MJPEG (ext/mp4.py —
    ftyp/mdat/moov with standard stsd/stts/stsc/stsz/stco sample
    tables, one JPEG per sample), then frame-sample the MP4 payloads
    through the same container-agnostic decode path q_video_mjpeg uses
    for AVI. Same JPEG codec underneath, so for identical input the AVI
    and MP4 routes decode IDENTICAL pixels (asserted in
    tests/test_llm2_ops.py); the h264/h265 codecs remain refused-with-
    NotImplementedError stubs that the per-record error column converts
    to flags, not dead jobs. All stages per-partition mapInPandas — no
    shuffle."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    mp4 = M.transcode_video_to_mjpeg(
        M.synth_video(d), fps=10, quality=90, container="mp4"
    )
    sampled = M.frame_sample(mp4.select("doc_id", "payload"), every_n=3)
    return sampled.select(
        "doc_id",
        "n_frames",
        "n_sampled",
        F.round(F.element_at("frame_means", 1), 2).alias("first_frame_mean"),
        F.round(F.element_at("frame_means", -1), 2).alias("last_frame_mean"),
    ).orderBy("doc_id")


@query("q_media_probe")  # rows-only: container-header metadata (no SQL analogue)
def q_media_probe(spark, sf_dir):
    """ffprobe-style media PROBE over a mixed-media corpus: route each
    document to one of six payload families (WAV audio, PPM image,
    baseline JPEG, progressive JPEG, AVI/MJPEG video, MP4/MJPEG video),
    then extract container/codec metadata from HEADERS ONLY
    (ext/probe.py: JPEG marker walk to SOF, RIFF/ISO-BMFF box walks,
    sample-table reads — no entropy decode, no frame decode). This is
    the 100 TB ingest triage step: probing costs I/O + microseconds per
    record, so a corpus routes/filters/budgets by kind, resolution,
    duration, and codec BEFORE paying for any decode. Per-record errors
    flag rows (pytest covers the poison path); all stages per-partition
    mapInPandas."""
    from mesin_spark.ext.probe import probe_media_features

    d = T(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 120)
    fam = F.col("doc_id") % 6
    wav = M.synth_wav(d.filter(fam == 0))
    ppm = M.synth_image(d.filter(fam == 1))
    jpg = M.transcode_to_jpeg(M.synth_image(d.filter(fam == 2)), quality=90).select(
        "doc_id", "payload"
    )
    prog = M.transcode_to_jpeg(
        M.synth_image(d.filter(fam == 3)), quality=90, progressive=True
    ).select("doc_id", "payload")
    avi = M.transcode_video_to_mjpeg(
        M.synth_video(d.filter(fam == 4)), fps=10, quality=90
    ).select("doc_id", "payload")
    mp4 = M.transcode_video_to_mjpeg(
        M.synth_video(d.filter(fam == 5)), fps=10, quality=90, container="mp4"
    ).select("doc_id", "payload")
    mixed = wav.unionByName(ppm).unionByName(jpg).unionByName(prog).unionByName(
        avi
    ).unionByName(mp4)
    return (
        probe_media_features(mixed)
        .select(
            "doc_id", "kind", "codec", "width", "height", "n_channels",
            "n_frames", F.round("fps", 3).alias("fps"), "sample_rate",
            F.round("duration_s", 6).alias("duration_s"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_dbscan",
    oracle="""
    WITH RECURSIVE e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    p AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE floor(list_cosine_similarity(a.v, b.v) * 1000000.0 + 0.5)
              / 1000000.0 >= 0.35
    ),
    sym AS (SELECT ia AS s, ib AS d FROM p UNION SELECT ib, ia FROM p),
    core AS (SELECT s AS node FROM sym GROUP BY s HAVING count(*) >= 3),
    ce AS (
        SELECT s, d FROM sym
        WHERE s IN (SELECT node FROM core) AND d IN (SELECT node FROM core)
    ),
    reach(node, lbl) AS (
        SELECT node, node FROM (SELECT DISTINCT s AS node FROM ce)
        UNION
        SELECT ce.d, r.lbl FROM reach r JOIN ce ON ce.s = r.node
    ),
    cc AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
    iso AS (
        SELECT node, node AS cluster_id FROM core
        WHERE node NOT IN (SELECT node FROM cc)
    ),
    cores AS (
        SELECT node, cluster_id, 'core' AS role FROM cc
        UNION ALL SELECT node, cluster_id, 'core' FROM iso
    ),
    border AS (
        SELECT sym.s AS node, min(c.cluster_id) AS cluster_id,
               'border' AS role
        FROM sym
        JOIN cores c ON c.node = sym.d
        WHERE sym.s NOT IN (SELECT node FROM core)
        GROUP BY sym.s
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(cluster_id AS BIGINT) AS cluster_id, role
    FROM (SELECT * FROM cores UNION ALL SELECT * FROM border)
    """,
)
def q_dbscan(spark, sf_dir):
    """DBSCAN over the embedding corpus (eps = 0.35 cosine, min_pts = 3)
    — density clustering composed from the tier's own primitives
    (ext/similarity.dbscan): salted exact eps-pairs → core-point agg →
    connected components over core-core edges (the dedup_clusters
    pointer-jumping loop) → min-cluster border adoption (makes classic
    DBSCAN's order-dependent border assignment unique, hence exactly
    cross-engine checkable) → noise dropped. The oracle rebuilds the
    whole pipeline in DuckDB with a recursive-CTE reachability closure.
    At 100 TB pass an LSH bucket as block_col — approximate DBSCAN with
    the identical downstream plan."""
    from mesin_spark.ext.similarity import dbscan

    emb = T(spark, sf_dir, "embeddings")
    out = dbscan(emb, eps=0.35, min_pts=3)
    return out.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
        "role",
    )
