"""Round-2 training-data operators, part 3: exact duplicated-span
statistics and removal (Lee et al. ExactSubstr dedup, ext/spans.py) and
product-quantization ANN (ext/pq.py).

The two span queries are deterministic string/position arithmetic, so
both carry exact DuckDB oracles (the oracle groups on shingle STRINGS
while Spark groups on xxhash64 longs — outputs agree unless xxhash64
collides, which over ~10^5 shingles is ~10^-9). q_pq_ann is rows-only:
codebooks come from seeded k-means, meaningless to re-derive in SQL;
recall-vs-exact and determinism are asserted in tests/test_llm4_ops.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mesin_spark.ext.ckpt import ckpt

from mesin_spark.ext import pq as PQ
from mesin_spark.ext import spans as SP
from mesin_spark.queries import R, T, query, sr, scratch_dir
from mesin_spark.ext.similarity import query_vector

#: DuckDB mirror of ext.text.tokens
_TK = "list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)"

_W = 8

#: shared oracle CTEs: per-position shingle instances + shingle owners
_SPAN_CTES = f"""
    tk AS (SELECT doc_id, {_TK} AS w FROM documents),
    inst AS (
        SELECT doc_id, i AS pos,
               list_aggregate(w[i:i+{_W}-1], 'string_agg', ' ') AS s
        FROM tk, unnest(generate_series(1, len(w) - {_W} + 1)) t(i)
    ),
    owners AS (SELECT s, min(doc_id) AS owner FROM inst GROUP BY s)
"""


@query(
    "q_span_stats",
    oracle=f"""
    WITH {_SPAN_CTES},
    per_doc AS (
        SELECT i.doc_id,
               count(*) AS n_shingles,
               count(CASE WHEN i.doc_id <> o.owner THEN 1 END) AS n_dup_spans
        FROM inst i JOIN owners o ON i.s = o.s
        GROUP BY i.doc_id
    )
    SELECT d.doc_id,
           coalesce(p.n_shingles, 0) AS n_shingles,
           coalesce(p.n_dup_spans, 0) AS n_dup_spans,
           {sr("coalesce(p.n_dup_spans::DOUBLE / p.n_shingles, 0.0)", 6)}
               AS dup_ratio
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    """,
)
def q_span_stats(spark, sf_dir):
    """Per-document duplicated-span profile at w=8 tokens: how much of
    each document is verbatim text owned by an earlier document. The
    corpus-health gate before exact-substring dedup (Lee et al. 2021).
    One shingle-hash groupBy + one equi-join; see ext/spans.py for the
    100 TB shape."""
    d = T(spark, sf_dir, "documents")
    spread = d.repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
    s = SP.span_stats(spread, w=_W)
    return s.select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_dup_spans").cast("long").alias("n_dup_spans"),
        R(F.col("dup_ratio").cast("double"), 6).alias("dup_ratio"),
    )


@query(
    "q_span_removal",
    oracle=f"""
    WITH {_SPAN_CTES},
    dup AS (
        SELECT i.doc_id, i.pos FROM inst i JOIN owners o ON i.s = o.s
        WHERE i.doc_id <> o.owner
    ),
    cov AS (
        SELECT DISTINCT doc_id, pos + off AS wi
        FROM dup, unnest(generate_series(0, {_W} - 1)) g(off)
    ),
    words AS (
        SELECT doc_id, i AS wi, w[i] AS word
        FROM tk, unnest(generate_series(1, len(w))) t(i)
    ),
    kept AS (
        SELECT wo.doc_id, wo.wi, wo.word
        FROM words wo ANTI JOIN cov ON wo.doc_id = cov.doc_id AND wo.wi = cov.wi
    ),
    rebuilt AS (
        SELECT doc_id,
               string_agg(word, ' ' ORDER BY wi) AS clean_text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CASE WHEN len(t.w) - coalesce(r.n_kept, 0) = 0 THEN d.text
                ELSE coalesce(r.clean_text, '') END AS clean_text,
           len(t.w) AS n_tokens,
           len(t.w) - coalesce(r.n_kept, 0) AS n_removed
    FROM tk t
    JOIN documents d ON d.doc_id = t.doc_id
    LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
    """,
)
def q_span_removal(spark, sf_dir):
    """Exact duplicated-span REMOVAL: every document rebuilt with the
    w=8-token spans already owned by an earlier document cut out — one
    corpus-wide copy of every duplicated span survives. This is the
    operator the MinHash tier approximates; here it is exact, via
    explode→hash-join→anti-join→reassemble (no suffix array, no
    all-pairs). Shuffles only on shingle hash and doc_id."""
    d = T(spark, sf_dir, "documents")
    spread = d.repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
    return SP.remove_spans(spread, w=_W)


@query("q_pq_ann")  # rows-only: seeded-k-means codebooks have no SQL mirror
def q_pq_ann(spark, sf_dir):
    """Product-quantization ANN top-10 for query vec_id=0: corpus
    compressed to m=8 4-bit-style codes, ranked by ADC lookup-table sums.
    The query-time scan is pure JVM over the codes column (Python only in
    the one-time encode pass); recall vs the exact scan is asserted in
    tests/test_llm4_ops.py."""
    emb = T(spark, sf_dir, "embeddings")
    qvec = query_vector(emb, 0)
    return PQ.pq_topk(emb, qvec, topk=10, m=8, k=16)


@query("q_bpe_train")  # rows-only: iterative training has no SQL mirror
def q_bpe_train(spark, sf_dir):
    """Distributed BPE tokenizer training (Sennrich et al. 2016): 12
    merges learned from the corpus word-frequency table. Each round is
    one pair-count shuffle over the DISTINCT-word table + one bounded
    top-k collect from which a snapshot-provable PREFIX of merges is
    accepted (ext/bpe._select_batch) — byte-identical to sequential
    argmax-per-merge training but ~batch-fold fewer driver rounds, the
    fix for the 32k-sequential-jobs bottleneck a production vocab would
    hit. Exact merge-for-merge equivalence with a pure-Python reference
    trainer (at 24 merges, interactions included) is asserted in
    tests/test_llm4_ops.py. Returns the merge table (the trained
    artifact); the registered query trains 12 — the test tier goes
    deeper."""
    from mesin_spark.ext.bpe import train_bpe

    d = T(spark, sf_dir, "documents")
    spread = d.repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
    merges = train_bpe(spread, n_merges=12, min_count=2)
    return spark.createDataFrame(
        [
            (m["rank"], m["left"], m["right"], m["merged"], m["pair_count"])
            for m in merges
        ],
        "rank int, left string, right string, merged string, pair_count long",
    )


@query("q_ivfpq_ann")  # rows-only: seeded trainers have no SQL mirror
def q_ivfpq_ann(spark, sf_dir):
    """IVF-PQ ANN top-10 (the full FAISS composition): probe the 4 nearest
    of 16 coarse lists, ADC-rank only those candidates over m=8 PQ codes.
    Scan cost = (n_probe/n_list) x codes-width — both prunings multiply.
    Recall vs the exact scan asserted in tests/test_llm4_ops.py."""
    emb = T(spark, sf_dir, "embeddings")
    qvec = query_vector(emb, 0)
    return PQ.ivfpq_topk(emb, qvec, topk=10, n_list=16, n_probe=4, m=8, k=16)


@query("q_image_dedup")  # rows-only: binary codec + perceptual hash (no SQL analogue)
def q_image_dedup(spark, sf_dir):
    """Image near-dup detection on real decoded bytes: synthesize a PPM
    per document (ids +1e12 get the same image re-encoded with pixel
    noise — planted near-dups an exact byte-hash misses), perceptual
    average-hash each (ext.multimodal.image_ahash: decode → gray → 8x8 →
    threshold bits), and group on the hash. Decode+hash are map-side
    mapInPandas; the groupBy on the 64-bit hash is the only shuffle —
    the 100 TB image-dedup shape (at scale, bucket by hash prefix and
    verify within buckets). Planted-pair recall is asserted in
    tests/test_llm4_ops.py."""
    from mesin_spark.ext import multimodal as MM

    d = T(spark, sf_dir, "documents").select("doc_id")
    dup = d.union(d.withColumn("doc_id", F.col("doc_id") + 1_000_000_000_000))
    hashed = MM.image_ahash(MM.synth_image(dup))
    # `ids` is emitted as a comma-joined string, not array<bigint>: the
    # driver's pandas canonicalizer lexsorts every output column and
    # cannot hash a raw list (same rule as q_fn_array, sql_menu2.py)
    return (
        hashed.groupBy("ahash")
        .agg(
            F.sort_array(F.collect_list("doc_id")).alias("_ids"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") >= 2)
        .orderBy(F.element_at("_ids", 1))
        .select(
            "ahash",
            F.array_join(F.col("_ids").cast("array<string>"), ",").alias("ids"),
            "n_copies",
        )
    )


@query("q_image_jpeg")  # rows-only: lossy binary codec path (no SQL analogue)
def q_image_jpeg(spark, sf_dir):
    """Image dedup THROUGH a real lossy codec: synthesize PPMs (ids
    +1e12 are planted near-dups), transcode every payload to baseline
    JPEG with the pure-Python T.81 encoder (ext/jpeg.py — the
    storage-compaction step a 100 TB image corpus runs at ingest),
    decode the JPEGs back, and perceptual-hash the RECOMPRESSED pixels.
    Quality 90: at q85 the quantization noise flips an ahash bit on ~2%
    of these tiny high-contrast fixtures (measured 294/300) — q90 keeps
    every planted pair. Near-dup groups must survive the quantization
    noise — the property
    ahash exists for, now exercised against genuine codec loss instead
    of synthetic pixel noise. All stages are per-partition mapInPandas;
    the hash groupBy is the only shuffle. Round-trip PSNR and planted
    recall are asserted in tests/test_llm4_ops.py."""
    from mesin_spark.ext import multimodal as MM

    # doc_id filter, not a bare limit: each union branch executes its
    # own GlobalLimit over the scan, and an unordered LIMIT can pick
    # DIFFERENT ids per branch — planted pairs would lose partners
    d = T(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 300)
    dup = d.union(d.withColumn("doc_id", F.col("doc_id") + 1_000_000_000_000))
    jpg = MM.transcode_to_jpeg(MM.synth_image(dup), quality=90)
    hashed = MM.image_ahash(jpg.select("doc_id", "payload"))
    # comma-joined string `ids` for the driver canonicalizer (no raw arrays)
    return (
        hashed.groupBy("ahash")
        .agg(
            F.sort_array(F.collect_list("doc_id")).alias("_ids"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") >= 2)
        .orderBy(F.element_at("_ids", 1))
        .select(
            "ahash",
            F.array_join(F.col("_ids").cast("array<string>"), ",").alias("ids"),
            "n_copies",
        )
    )


@query("q_cdc_dedup")  # rows-only: rolling-hash chunking has no SQL mirror
def q_cdc_dedup(spark, sf_dir):
    """Content-defined-chunking dedup over binary payloads (ext/cdc.py —
    buzhash boundaries, FNV-1a chunk hashes): every document's bytes get
    a PLANTED twin with a unique prefix spliced in front, i.e. the same
    content at shifted offsets — the case where fixed-width chunking
    shares ZERO blocks (every boundary moves) but CDC keeps ~95% of
    chunks intact because boundaries derive from content, not position
    (both measured in tests/test_cdc.py). Output:
    per original document its chunk count and the fraction of its chunks
    the shifted twin still shares — the storage-dedup index view. The
    chunker is per-payload numpy in mapInPandas (no shuffle); the dedup
    joins key on the 64-bit chunk hash."""
    from pyspark.sql import Window

    from mesin_spark.ext.cdc import chunk_payloads

    # long NON-PERIODIC payloads: each doc's bytes = the concatenation of
    # its own and the next 7 documents' texts (a repeat() of one text
    # would make every chunk hash-identical and the test vacuous)
    w8 = Window.orderBy("doc_id").rowsBetween(0, 7)
    d = (
        T(spark, sf_dir, "documents")
        .select("doc_id", "text")
        # pre-filter BEFORE the global-sort window: the kept rows are
        # doc_id < 150 and each needs only the 7 FOLLOWING texts, so
        # doc_id < 157 bounds the unavoidable single-partition window
        # stage to 157 rows instead of the whole (3x-scalable) corpus —
        # byte-identical output, pushdown-friendly scan
        .filter(F.col("doc_id") < 150 + 7)
        .withColumn("_blob", F.concat_ws(" ", F.collect_list("text").over(w8)))
        .filter(F.col("doc_id") < 150)
        .select("doc_id", F.encode(F.col("_blob"), "UTF-8").alias("payload"))
    )
    twins = d.select(
        (F.col("doc_id") + 1_000_000_000_000).alias("doc_id"),
        F.concat(
            F.encode(
                F.concat(F.lit("PFX-"), F.col("doc_id").cast("string")), "UTF-8"
            ),
            F.col("payload"),
        ).alias("payload"),
    )
    chunks = chunk_payloads(
        d.unionByName(twins), avg_size=256, min_size=64, max_size=1024
    ).filter(F.col("error").isNull())
    orig = chunks.filter(F.col("doc_id") < 1_000_000_000_000).select(
        "doc_id", "chunk_idx", "chunk_hash"
    )
    twin = chunks.filter(F.col("doc_id") >= 1_000_000_000_000).select(
        (F.col("doc_id") - 1_000_000_000_000).alias("doc_id"),
        F.col("chunk_hash").alias("t_hash"),
    ).distinct()
    shared = orig.join(
        twin,
        (orig["doc_id"] == twin["doc_id"]) & (orig["chunk_hash"] == twin["t_hash"]),
        "left_semi",
    )
    n_all = orig.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    n_sh = shared.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shared"))
    return (
        n_all.join(n_sh, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            R(
                F.coalesce("n_shared", F.lit(0)) / F.col("n_chunks"), 6
            ).alias("shared_frac"),
        )
        .orderBy("doc_id")
    )


@query("q_image_progressive")  # rows-only: lossy binary codec path (no SQL analogue)
def q_image_progressive(spark, sf_dir):
    """Progressive-JPEG parity end-to-end: every synthesized image is
    transcoded TWICE — once as baseline (SOF0), once as progressive
    (SOF2: spectral-selection + successive-approximation scans with
    per-scan K.2-optimal Huffman tables, ext/jpeg.py
    make_progressive_jpeg_payload) — and both variants are decoded and
    perceptually hashed. Both encoders quantize the same coefficients,
    so the decoded pixels and therefore the hashes must match exactly;
    ``hash_match`` is the self-checking column (bit-identity asserted
    in tests/test_llm4_ops.py). Progressive is the JPEG class real web
    corpora contain most after baseline — this query certifies the
    engine ingests it natively rather than quarantining it. All stages
    per-partition mapInPandas; the only shuffle is the parity join on
    doc_id."""
    from mesin_spark.ext import multimodal as MM

    d = T(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 200)
    imgs = MM.synth_image(d)
    # each transcode frame feeds TWO actions (its hash branch and the
    # byte-size join); materialize once so the pure-Python JPEG encode —
    # the dominant cost — runs once per image per variant, not twice
    base = MM.transcode_to_jpeg(imgs, quality=90).transform(ckpt, eager=True)
    prog = MM.transcode_to_jpeg(imgs, quality=90, progressive=True).transform(ckpt, 
        eager=True
    )
    hb = MM.image_ahash(base.select("doc_id", "payload")).select(
        "doc_id", F.col("ahash").alias("ahash_base")
    )
    hp = MM.image_ahash(prog.select("doc_id", "payload")).select(
        "doc_id", F.col("ahash").alias("ahash_prog")
    )
    sz = base.select("doc_id", F.col("n_bytes").alias("bytes_base")).join(
        prog.select("doc_id", F.col("n_bytes").alias("bytes_prog")), "doc_id"
    )
    return (
        hb.join(hp, "doc_id")
        .join(sz, "doc_id")
        .select(
            "doc_id",
            "ahash_base",
            "ahash_prog",
            (F.col("ahash_base") == F.col("ahash_prog")).alias("hash_match"),
            "bytes_base",
            "bytes_prog",
        )
        .orderBy("doc_id")
    )


@query("q_bpe_encode")  # rows-only: the iterative trainer has no SQL mirror
def q_bpe_encode(spark, sf_dir):
    """Apply the trained tokenizer: learn 12 BPE merges from the corpus,
    then encode every DISTINCT word into its merge pieces — the full
    train→apply tokenizer pipeline (the piece table is what a serving
    tokenizer ships). Encoding folds the merge list over the word's
    char array with built-in higher-order functions (ext/bpe.py
    encode_words) — JVM-side, linear in corpus vocabulary, no Python in
    the encode path; pure-Python equivalence is asserted in
    tests/test_llm4_ops.py. Returns the top-200 most frequent words'
    encodings (deterministic: count desc, word asc)."""
    from mesin_spark.ext.bpe import encode_words, train_bpe, word_counts

    d = T(spark, sf_dir, "documents")
    spread = d.repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
    merges = train_bpe(spread, n_merges=12, min_count=2)
    words = word_counts(spread)
    enc = encode_words(words, merges)
    # `pieces` is space-joined to a string: the driver canonicalizer
    # cannot hash array cells (see q_fn_array, sql_menu2.py); BPE pieces
    # never contain spaces (they're substrings of whitespace-split words)
    return (
        enc.join(words, "word")
        .select(
            "word",
            F.col("wcount").alias("n"),
            F.array_join("pieces", " ").alias("pieces"),
            F.size("pieces").alias("n_pieces"),
        )
        .orderBy(F.desc("n"), "word")
        .limit(200)
    )


@query("q_ann_index")  # rows-only: seeded trainers have no SQL mirror
def q_ann_index(spark, sf_dir):
    """Persisted ANN index round-trip: build the IVF-PQ index ONCE
    (coded corpus written partitioned by ivf_list + centroids/codebooks
    as JSON), reopen it cold via load_index, and answer top-10 for
    query vec_id=0 scanning only the probed list partitions — partition
    pruning over a 32x-compressed codes table, the ANN serving layout
    at 100 TB. Recall vs the exact scan and the PartitionFilters plan
    are asserted in tests."""

    from mesin_spark.ext import ann_index as AI

    emb = T(spark, sf_dir, "embeddings")
    path = scratch_dir(prefix="mesin_annidx_")
    AI.build_index(emb, path, n_list=16, m=8, k=16)
    idx = AI.load_index(spark, path)
    qvec = query_vector(emb, 0)
    return idx.topk(qvec, topk=10, n_probe=4)


@query("q_ann_incremental")  # rows-only: seeded trainers have no SQL mirror
def q_ann_incremental(spark, sf_dir):
    """Incremental ANN index maintenance (ext/ann_index.append_batch):
    day-1 index built on 4/5 of the embeddings, then the remaining 1/5
    arrives as a batch — encoded ONLY with the persisted frozen
    centroids/codebooks and APPENDED to the partitioned codes table (no
    rebuild pass over the built corpus). Returns the per-list drift
    report: cumulative occupancy vs build baselines plus the batch's
    coarse-quantizer fit drop — the measured signals that turn
    retraining into a decision instead of a per-batch reflex. The
    in-distribution batch must not trip a rebuild anywhere (asserted
    here by construction of the fixture; append≡rebuild equality and
    reopen/recall are pytested in tests/test_llm4_ops.py)."""
    from mesin_spark.ext import ann_index as AI

    emb = T(spark, sf_dir, "embeddings")
    path = scratch_dir(prefix="mesin_annincr_")
    idx = AI.build_index(
        emb, path, n_list=16, m=8, k=16,
        corpus=emb.filter(F.col("vec_id") % 5 != 0),
    )
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    return AI.append_batch(idx, batch).orderBy("ivf_list")


@query("q_ann_compact")  # rows-only: physical-layout maintenance cycle
def q_ann_compact(spark, sf_dir):
    """Steady-state ANN maintenance cycle end to end
    (ext/ann_index.compact_index + vacuum_index — round-11 ask #3):
    build on 4/5 of the embeddings, append the rest as THREE separate
    batches (each append lays its own parquet files into every touched
    ivf_list partition — the small-file growth every incremental ingest
    accrues), then bin-pack the codes table into the next versioned
    corpus dir (one file per list, committed by the same atomic meta
    swap a rebuild uses) and vacuum the superseded dir. Output is the
    cycle's self-check — compaction fired, the probe's top-k is
    byte-identical across the rewrite, exactly one old corpus dir was
    vacuumed — deterministic under any CPU count (file COUNTS are not:
    task parallelism decides how many files an append writes, so they
    stay out of the row). Reopen-equality, counter survival, and
    below-threshold no-op are pytested in tests/test_llm4_ops.py.
    Maintenance cadence: compact every ~max_files_per_list appends;
    a rebuild resets the clock (it always writes compact)."""
    from mesin_spark.ext import ann_index as AI

    emb = T(spark, sf_dir, "embeddings")
    path = scratch_dir(prefix="mesin_anncmp_")
    idx = AI.build_index(
        emb, path, n_list=16, m=8, k=16,
        corpus=emb.filter(F.col("vec_id") % 5 != 0),
    )
    for i in range(3):
        AI.append_batch(idx, emb.filter(
            (F.col("vec_id") % 5 == 0) & (F.col("vec_id") % 3 == i)
        ))
    qvec = query_vector(emb, 0)
    before = [tuple(r) for r in idx.topk(qvec, topk=10, n_probe=4).collect()]
    rep = AI.compact_index(idx, max_files_per_list=2)
    after = [tuple(r) for r in idx.topk(qvec, topk=10, n_probe=4).collect()]
    removed = AI.vacuum_index(idx)
    return spark.createDataFrame(
        [(bool(rep["compacted"]), before == after, len(removed))],
        "compacted boolean, topk_unchanged boolean, vacuumed_dirs int",
    )


@query(
    "q_ann_sq8",
    oracle=f"""
    WITH dims AS (
        SELECT i, min(CAST(embedding[i] AS DOUBLE)) AS lo,
               max(CAST(embedding[i] AS DOUBLE)) AS hi
        FROM embeddings, range(1, 65) t(i)
        GROUP BY i
    ), b AS (
        SELECT list(lo ORDER BY i) AS lo, list(hi ORDER BY i) AS hi FROM dims
    ), coded AS (
        SELECT vec_id,
               list_transform(range(1, 65), i ->
                   CASE WHEN b.hi[i] > b.lo[i]
                        THEN floor((CAST(e.embedding[i] AS DOUBLE) - b.lo[i])
                                   * 255.0 / (b.hi[i] - b.lo[i]) + 0.5)
                        ELSE 0 END) AS code
        FROM embeddings e CROSS JOIN b
    ), q AS (SELECT code AS qcode FROM coded WHERE vec_id = 0)
    SELECT c.vec_id,
           {sr("list_sum(list_transform("
               "list_transform(range(1, 65), i -> (c.code[i] - q.qcode[i]) * (b.hi[i] - b.lo[i]) / 255.0),"
               " x -> x * x))", 6)} AS dist
    FROM coded c CROSS JOIN b CROSS JOIN q
    WHERE c.vec_id <> 0
    ORDER BY dist ASC NULLS LAST, c.vec_id ASC NULLS LAST
    LIMIT 10
    """,
)
def q_ann_sq8(spark, sf_dir):
    """Int8 scalar-quantized ANN (FAISS SQ8 / QT_8bit, symmetric
    decoded-L2²): per-dimension [lo,hi] train pass = one distributive
    aggregate; encode = map-side uint8 codes (4× smaller than float32 —
    the 100 TB scan-size win when the code column is persisted); search
    = one codegen'd scan + TakeOrderedAndProject. Every step is exact
    integer/double arithmetic from stored rows (floor(+0.5) spells the
    rounding rule), so unlike the seeded-k-means PQ tier this holds a
    full cross-engine oracle — the quantization tier's exact proof.
    Ref parity n/a (charter extension; reference has no vector surface)."""
    from mesin_spark.ext.similarity import sq8_topk

    return sq8_topk(T(spark, sf_dir, "embeddings"), query_id=0, k=10)


@query(
    "q_pq_portable",
    oracle=f"""
    WITH cwv AS (
        SELECT vec_id AS j, embedding AS c FROM embeddings WHERE vec_id < 16
    ), sp AS (SELECT unnest([0, 1, 2, 3]) AS s),
    dists AS (
        SELECT e.vec_id, sp.s, w.j,
               {sr("list_sum(list_transform(list_transform(range(1, 17), i -> CAST(e.embedding[sp.s*16 + i] AS DOUBLE) - CAST(w.c[sp.s*16 + i] AS DOUBLE)), x -> x * x))", 6)} AS d
        FROM embeddings e CROSS JOIN sp CROSS JOIN cwv w
    ),
    codes AS (
        SELECT vec_id,
               max(CASE WHEN s = 0 THEN j END) AS c0,
               max(CASE WHEN s = 1 THEN j END) AS c1,
               max(CASE WHEN s = 2 THEN j END) AS c2,
               max(CASE WHEN s = 3 THEN j END) AS c3
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, s
                                           ORDER BY d ASC, j ASC) AS rn
              FROM dists)
        WHERE rn = 1
        GROUP BY vec_id
    ),
    lut AS (
        SELECT sp.s, w.j,
               {sr("list_sum(list_transform(list_transform(range(1, 17), i -> CAST(q.qe[sp.s*16 + i] AS DOUBLE) - CAST(w.c[sp.s*16 + i] AS DOUBLE)), x -> x * x))", 6)} AS d
        FROM cwv w CROSS JOIN sp
        CROSS JOIN (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
    )
    SELECT c.vec_id,
           {sr("(SELECT d FROM lut WHERE s = 0 AND j = c.c0)"
               " + (SELECT d FROM lut WHERE s = 1 AND j = c.c1)"
               " + (SELECT d FROM lut WHERE s = 2 AND j = c.c2)"
               " + (SELECT d FROM lut WHERE s = 3 AND j = c.c3)", 6)} AS dist
    FROM codes c
    WHERE c.vec_id <> 0
    ORDER BY dist ASC NULLS LAST, c.vec_id ASC NULLS LAST
    LIMIT 10
    """,
)
def q_pq_portable(spark, sf_dir):
    """Product-quantization ANN with DETERMINISTIC seed-row codebooks
    (ext/similarity.pq_portable_topk: 4 subspaces x 16 codewords = the
    subvectors of stored ids 0..15) — the portable proof for the PQ
    class whose k-means variants (q_pq_ann, q_ivfpq_ann) are rows-only
    by construction. Encode = per-subspace argmin of 6-dp-rounded L2²
    (ties to the smallest codeword id); ADC distances are FIXED-ORDER
    sums of rounded lookup-table literals, so the full top-10 compares
    exactly cross-engine. Same scale shape as the k-means PQ: bounded
    codebook collect, map-side 16-byte codes, one literal-table scan."""
    from mesin_spark.ext.similarity import pq_portable_topk

    return pq_portable_topk(T(spark, sf_dir, "embeddings"), query_id=0, k=10)
