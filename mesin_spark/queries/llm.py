"""Charter extension queries — dedup, similarity search, text analysis,
multimodal, streaming (SURVEY.md §2.11).

Oracle strategy: deterministic closed-form operators (exact dedup, token
stats, quality score, language ID, fingerprint, cosine similarity, n-gram
Jaccard) are fully DuckDB-checkable. Sketch-based operators built on
engine-native hashes (MinHash-LSH, SimHash, LSH-ANN) are rows-only by
design; their *quality* is asserted in tests/test_llm_ops.py (recall vs
the exact answer, planted-duplicate detection). q_minhash_portable is
the exception that proves the tier: its sketch arithmetic is portable
mod-1e9+7 integer math, so the full LSH pair list oracle-compares
EXACTLY.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mesin_spark.ext import dedup as D
from mesin_spark.ext import multimodal as M
from mesin_spark.ext import pipeline as P
from mesin_spark.ext import similarity as S
from mesin_spark.ext import streaming as STR
from mesin_spark.ext import text as TX
from mesin_spark.queries import T, query, sr
from mesin_spark.ext.similarity import query_vector


def _docs_with_dups(spark, sf_dir):
    """documents ∪ shifted copy — planted exact duplicates so dedup queries
    actually dedup (the raw table has none)."""
    d = T(spark, sf_dir, "documents")
    return d.union(d.withColumn("doc_id", F.col("doc_id") + 1000000000000))


@query(
    "q_dedup_exact",
    oracle="""
    WITH dup AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000000000, text FROM documents
    )
    SELECT text, MIN(doc_id) AS doc_id, count(*) AS n_copies
    FROM dup GROUP BY text
    """,
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on content, keep min id (charter op;
    SURVEY.md §2.11). Input has planted duplicates."""
    dup = _docs_with_dups(spark, sf_dir).select("doc_id", "text")
    return D.exact_dedup(dup, ["text"], "doc_id")


@query("q_dedup_minhash")  # rows-only: xxhash64-based sketches are Spark-native
def q_dedup_minhash(spark, sf_dir):
    """MinHash(64)+LSH(16 bands) near-dup pairs, exact-Jaccard verified at
    ≥0.7. With planted exact duplicates every (id, id+1e12) pair must
    surface — asserted in tests; here the driver checks rows/schema."""
    dup = _docs_with_dups(spark, sf_dir).select("doc_id", "text")
    return D.minhash_lsh_dedup(dup, "doc_id", threshold=0.7)


#: shared CTE chain deriving the portable-arithmetic LSH candidate set
#: (dup -> tokens -> shingles -> fingerprints -> signatures -> bands ->
#: capped buckets -> cands); both the pair query and the clusters query
#: compose their oracles from the SAME text, so the two stay in lockstep
#: SQL literal of the 16 portable (a, b) permutation params, generated
#: from the SAME function the Spark sketch uses — the oracle can't drift
_PERM_PARAMS_SQL = "[" + ", ".join(
    f"[{a}, {b}]" for a, b in D.portable_perm_params(16)
) + "]"

_MINHASH_PORTABLE_CTES = f"""dup AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000000000, text FROM documents
    ), tk AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0) AS t
        FROM dup
    ), sh AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                    THEN list_distinct(list_transform(range(1, len(t) - 1),
                         i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))
                    ELSE [array_to_string(t, ' ')] END AS s
        FROM tk
    ), fps AS (
        SELECT doc_id, list_transform(s, g ->
            list_reduce(
                list_prepend(CAST(0 AS BIGINT),
                    list_transform(
                        list_filter(string_split(g, ''), c -> length(c) > 0),
                        c -> CAST(unicode(c) AS BIGINT))),
                (h, c) -> (h * 131 + c) % 1000000007)) AS f
        FROM sh
    ), sig AS (
        SELECT doc_id, f,
               list_transform({_PERM_PARAMS_SQL}, p ->
                   list_min(list_transform(f, h -> (p[1] * h + p[2]) % 1000000007))) AS sg
        FROM fps
    ), banded AS (
        SELECT doc_id, j AS band,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT), sg[j * 4 + 1 : j * 4 + 4]),
                   (h, v) -> (h * 131 + v) % 1000000007) AS bkey
        FROM sig, unnest([0, 1, 2, 3]) AS u(j)
    ), capped AS (
        SELECT * FROM (
            SELECT doc_id, band, bkey,
                   count(*) OVER (PARTITION BY band, bkey) AS bn
            FROM banded)
        WHERE bn <= 64
    ), cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM capped a JOIN capped b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    )"""


@query(
    "q_minhash_portable",
    oracle=f"""
    WITH {_MINHASH_PORTABLE_CTES}
    SELECT c.id_a, c.id_b,
           {sr("len(list_intersect(fa.f, fb.f))::DOUBLE / len(list_distinct(list_concat(fa.f, fb.f)))", 6)} AS jaccard
    FROM cands c
    JOIN fps fa ON fa.doc_id = c.id_a
    JOIN fps fb ON fb.doc_id = c.id_b
    WHERE floor((len(list_intersect(fa.f, fb.f))::DOUBLE
          / len(list_distinct(list_concat(fa.f, fb.f)))) * 1000000.0 + 0.5) / 1000000.0 >= 0.7
    ORDER BY id_a, id_b
    """,
)
def q_minhash_portable(spark, sf_dir):
    """MinHash-LSH near-dup pairs whose ENTIRE sketch pipeline is
    bit-reproducible in an independent engine — shingle fingerprints,
    the 16 permutations, and band keys are all exact h*k+c mod 1e9+7
    integer arithmetic with inlined literal parameters, so the DuckDB
    oracle reproduces the identical candidate buckets and the pair list
    compares EXACTLY (the engine-native q_dedup_minhash stays rows-only
    because xxhash64 sketches can't cross engines; this variant closes
    that gap the way the KMV sketch tier already does for distinct
    counts). Plan shape unchanged from the native variant: one shingle
    pass, window-capped LSH buckets, exact-Jaccard verify on hashed
    shingle sets."""
    dup = _docs_with_dups(spark, sf_dir).select("doc_id", "text")
    return D.minhash_lsh_portable(dup, "doc_id", threshold=0.7).orderBy(
        "id_a", "id_b"
    )


@query("q_dedup_simhash")  # rows-only: same reason
def q_dedup_simhash(spark, sf_dir):
    """SimHash-64 near-dup pairs (Hamming ≤ 3) via 16-bit chunk candidates."""
    dup = _docs_with_dups(spark, sf_dir).select("doc_id", "text")
    return D.simhash_dedup(dup, "doc_id").orderBy("id_a", "id_b")


@query(
    "q_simhash_portable",
    oracle="""
    WITH dup AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000000000, text FROM documents
    ), tk AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0) AS t
        FROM dup
    ), fps AS (
        SELECT doc_id, list_transform(t, tok ->
            list_reduce(
                list_prepend(CAST(0 AS BIGINT),
                    list_transform(
                        list_filter(string_split(tok, ''), c -> length(c) > 0),
                        c -> CAST(unicode(c) AS BIGINT))),
                (h, c) -> (h * 131 + c) % 1000000007)) AS f
        FROM tk
    ), bits AS (
        SELECT doc_id,
               list_transform(range(0, 64), b ->
                   CASE WHEN 2 * len(list_filter(f, h ->
                            ((h * (2654435761 + 40503 * b)) % 2147483648) // 16384 % 2 = 1))
                        > len(f)
                        THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS bt
        FROM fps
    ), chx AS (
        SELECT doc_id,
               list_transform([0, 1, 2, 3], c ->
                   list_reduce(
                       list_prepend(CAST(0 AS BIGINT), bt[c * 16 + 1 : c * 16 + 16]),
                       (a, b) -> a * 2 + b)) AS ch
        FROM bits
    ), banded AS (
        SELECT doc_id, c AS chunk, ch[c + 1] AS ckey
        FROM chx, unnest([0, 1, 2, 3]) AS u(c)
    ), capped AS (
        SELECT * FROM (
            SELECT doc_id, chunk, ckey,
                   count(*) OVER (PARTITION BY chunk, ckey) AS bn
            FROM banded)
        WHERE bn <= 256
    ), cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM capped a JOIN capped b
          ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(fa.ch[1], fb.ch[1])) + bit_count(xor(fa.ch[2], fb.ch[2]))
              + bit_count(xor(fa.ch[3], fb.ch[3])) + bit_count(xor(fa.ch[4], fb.ch[4]))
              AS BIGINT) AS hamming
    FROM cands c
    JOIN chx fa ON fa.doc_id = c.id_a
    JOIN chx fb ON fb.doc_id = c.id_b
    WHERE bit_count(xor(fa.ch[1], fb.ch[1])) + bit_count(xor(fa.ch[2], fb.ch[2]))
        + bit_count(xor(fa.ch[3], fb.ch[3])) + bit_count(xor(fa.ch[4], fb.ch[4])) <= 3
    ORDER BY id_a, id_b
    """,
)
def q_simhash_portable(spark, sf_dir):
    """SimHash near-dup pairs (Hamming ≤ 3) with BIT-REPRODUCIBLE
    signatures: token fingerprints vote on 64 bits derived by exact
    mod-2^31 integer arithmetic, chunk keys pack bit-slices, candidates
    share a 16-bit chunk (pigeonhole) — the DuckDB oracle reproduces the
    identical chunks and the pair list compares EXACTLY. The engine-
    native q_dedup_simhash stays rows-only (xxhash64 bits); this is the
    SimHash tier's cross-engine proof, like q_minhash_portable."""
    dup = _docs_with_dups(spark, sf_dir).select("doc_id", "text")
    return D.simhash_portable_dedup(dup, "doc_id").orderBy("id_a", "id_b")


@query(
    "q_dedup_ngram",
    oracle="""
    WITH dup AS (
        SELECT doc_id, source, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000000000 AS doc_id, source, text
        FROM documents WHERE doc_id % 10 = 0
    ),
    toks AS (
        SELECT doc_id, source,
               list_distinct(list_transform(
                   range(1, greatest(len(tk) - 1, 1) + 1),
                   i -> tk[i] || ' ' || tk[i + 1]
               )) AS g
        FROM (
            SELECT doc_id, source,
                   list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0) AS tk
            FROM dup
        )
        WHERE len(tk) >= 2
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           floor((len(list_intersect(a.g, b.g))::DOUBLE
                 / len(list_distinct(list_concat(a.g, b.g)))) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
    FROM toks a JOIN toks b
      ON a.source = b.source
     AND len(a.g) // 2 = len(b.g) // 2
     AND a.doc_id < b.doc_id
    WHERE floor((len(list_intersect(a.g, b.g))::DOUBLE
          / len(list_distinct(list_concat(a.g, b.g)))) * 1000000.0 + 0.5) / 1000000.0 >= 0.9
    """,
)
def q_dedup_ngram(spark, sf_dir):
    """Word-2-gram Jaccard pairs blocked on (source, length-band) at the
    PRODUCTION threshold (0.9) — exact pairwise similarity within each
    block, fully oracle-checkable (the oracle mirrors the identical
    integer band arithmetic, `len(g) // 2`).

    The length band bounds block occupancy: blocking on `source` alone is
    low-cardinality, so candidate pairs grew with occupancy² as the corpus
    scaled (driver-measured slope 3.8 at 3× data; width 4 still measured
    2.2). The 2-wide distinct-gram-count band halves candidates again vs
    width 4 (DuckDB-counted 28.8k → 14.4k at sf0.1) and brought the
    measured 3×-data slope under 2; the documented tolerance is that
    near-dup pairs whose gram counts straddle a band boundary are not
    reported (a size-similarity prefilter — standard in pair-generation
    dedup; high-Jaccard pairs with very different sizes are already rare
    — a pair is only excluded when it sits right on a band edge).

    The synthetic corpus has no natural near-dups (max natural jaccard
    ~0.52), so near-dups are PLANTED (the q_dedup_embed pattern,
    mirrored in the oracle SQL): every 10th document gets a verbatim
    clone at doc_id+10**12 in the same source block — identical text →
    identical gram set → same length band — and exactly those
    (original, clone, 1.0) pairs must survive the 0.9 cut, with
    jaccard = 1.0 far from any rounding boundary. This replaced the
    round-3..8 fixture-tuned 0.055 threshold: the production
    decision now fires on the driver fixture directly. Shingle-level
    NEAR-dup recall (jaccard strictly between 0.9 and 1.0) through the
    same auto-routed plan stays pytest-proven on a crafted corpus
    (test_stats.py::test_auto_ngram_route_is_blocked)."""
    raw = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    clones = raw.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000_000_000).alias("doc_id"), "source", "text"
    )
    docs = raw.unionByName(clones).filter(TX.token_count("text") >= 2)
    # n_salts=4, not the 16 default: the length band multiplies block
    # cardinality ~50x, so parallelism comes from the blocks themselves
    # and heavy salting only replicates the gram-array side's shuffle
    # payload (measured: 16 salts cost +20% at both scale points)
    # prefix_filter="auto": measured occupancy routing (identical output
    # either way) — at bench scales the banded blocks stay far under the
    # 64-candidates/doc crossover so the salted all-pairs path runs; a
    # corpus whose blocks outgrow the band prefilter flips to the
    # PPJoin prefix path instead of going quadratic
    return D.ngram_jaccard_pairs(
        docs, "doc_id", block_col="source", n=2, threshold=0.9,
        length_band=2, n_salts=4, prefix_filter="auto",
    ).orderBy("id_a", "id_b")


@query(
    "q_dedup_embed",
    oracle="""
    WITH planted AS (
        SELECT vec_id, embedding, label FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000000000 AS vec_id, embedding, label
        FROM embeddings WHERE vec_id % 10 = 0
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           floor((list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[]))) * 1000000.0 + 0.5) / 1000000.0 AS sim
    FROM planted a JOIN planted b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE floor((list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[]))) * 1000000.0 + 0.5) / 1000000.0 >= 0.99
    """,
)
def q_dedup_embed(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs inside label blocks at the
    PRODUCTION threshold (0.99). candidates="auto" is the measured-
    occupancy routing of the ngram/containment/fuzzy tiers: below 512
    all-pairs candidates per row (every bench scale point — the driver
    fixture's exact-oracle path) the exact within-block pair scan runs;
    past it the block key composes with hyperplane-LSH band signatures
    (ext/similarity.portable_lsh_band_signature) and candidates scale
    with bucket collisions instead of occupancy² — identical vectors
    share every band signature, so planted-clone recall survives the
    route (pytest-asserted with candidates forced on).

    approx_ok=True is the EXPLICIT opt-in the LSH fallback requires
    (crossing the cliff changes semantics — exact → ~98% recall for
    non-identical near-dups — so unlike the repo's other auto routes it
    cannot flip silently). It is deliberate here: every oracle-checked
    fixture scale stays below the cliff (exact route, oracle-green),
    and past it — the 100x probe — the only ≥0.99 pairs this fixture
    family CAN contain are planted identical clones, which share every
    band signature and are never missed, so the documented recall trade
    affects no fixture answer.

    The synthetic embeddings have no natural near-dups (max within-label
    cosine 0.45/0.47/0.51 at sf 0.001/0.01/0.1), so near-dups are
    PLANTED (the q_image_dedup pattern, mirrored in the oracle SQL):
    every 10th vector gets an identical clone at vec_id+10**12 in the
    same label block, and exactly those (original, clone, 1.0) pairs
    must survive the 0.99 cut — the production decision fires on the
    driver fixture, with sim = 1.0 far from any rounding boundary.
    Clone recall through the operator is additionally pytest-checked in
    test_llm_ops.py."""
    emb = T(spark, sf_dir, "embeddings")
    clones = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000_000_000).alias("vec_id"), "embedding", "label"
    )
    planted = emb.select("vec_id", "embedding", "label").unionByName(clones)
    return S.embedding_neardup_pairs(
        planted, threshold=0.99, candidates="auto", approx_ok=True
    ).orderBy("id_a", "id_b")


@query(
    "q_sim_topk",
    oracle="""
    SELECT b.vec_id,
           floor((list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                                        CAST(q.embedding AS DOUBLE[]))) * 1000000.0 + 0.5) / 1000000.0 AS sim
    FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    ORDER BY sim DESC NULLS LAST, b.vec_id ASC NULLS LAST
    LIMIT 10
    """,
)
def q_sim_topk(spark, sf_dir):
    """Brute-force cosine top-10 for query vector vec_id=0 — the exact ANN
    baseline: one codegen'd scan, per-partition k-heaps
    (TakeOrderedAndProject), no shuffle of the corpus."""
    emb = T(spark, sf_dir, "embeddings")
    qvec = query_vector(emb, 0)
    return S.brute_force_topk(emb, qvec, k=10)


@query(
    "q_ann_portable",
    oracle=f"""
    WITH sigs AS (
        SELECT vec_id, embedding,
               list_transform(range(0, 4), p ->
                   CASE WHEN list_sum(list_transform(range(1, 65), i ->
                            CAST(embedding[i] AS DOUBLE)
                            * ({S.portable_plane_weights_sql(4, 64)})[p + 1][i])) > 0
                        THEN ([1, 2, 4, 8])[p + 1]
                        ELSE 0 END) AS bits
        FROM embeddings
    ), keyed AS (
        SELECT vec_id, embedding,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(bits, b -> CAST(b AS BIGINT))), (a, b) -> a + b) AS sig
        FROM sigs
    ), q AS (
        SELECT embedding AS qe, sig AS qs FROM keyed WHERE vec_id = 0
    )
    SELECT s.vec_id,
           {sr("list_cosine_similarity(CAST(s.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[]))", 6)} AS sim
    FROM keyed s, q
    WHERE s.sig = q.qs AND s.vec_id <> 0
    ORDER BY sim DESC NULLS LAST, s.vec_id ASC NULLS LAST
    LIMIT 10
    """,
)
def q_ann_portable(spark, sf_dir):
    """ANN top-10 inside the query's portable-LSH bucket — ±1
    hyperplane weights come from exact integer arithmetic (one shared
    literal table both engines inline), so the bucket assignment and
    therefore the candidate set are cross-engine deterministic, and the
    exact cosine ranking inside the bucket compares EXACTLY. The
    engine-native q_ann_lsh (md5 hyperplanes + multiprobe) stays
    rows-only; this is the ANN tier's cross-engine proof. Scale path
    unchanged: the signature filter becomes partition pruning on a
    corpus written partitioned by bucket."""
    emb = T(spark, sf_dir, "embeddings")
    return S.portable_lsh_topk(emb, query_id=0, k=10, n_planes=4)


@query("q_ann_lsh")  # rows-only: bucket pruning is approximate by design
def q_ann_lsh(spark, sf_dir):
    """LSH-bucketed ANN top-10 (8 hyperplanes, 3-bit multiprobe): exact
    ranking restricted to probed signature buckets. Recall vs the exact
    top-k asserted in tests."""
    emb = T(spark, sf_dir, "embeddings")
    qvec = query_vector(emb, 0)
    return S.lsh_topk(emb, qvec, k=10)


@query(
    "q_ivf_portable",
    oracle=f"""
    WITH seeds AS (
        SELECT vec_id AS j, embedding AS c FROM embeddings WHERE vec_id < 16
    ), scored AS (
        SELECT e.vec_id, e.embedding, s.j,
               {sr("list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(s.c AS DOUBLE[]))", 6)} AS sim
        FROM embeddings e CROSS JOIN seeds s
    ), assigned AS (
        SELECT vec_id, embedding, j AS lst
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                           ORDER BY sim DESC, j ASC) AS rn
              FROM scored)
        WHERE rn = 1
    ), qprobe AS (
        SELECT j FROM scored WHERE vec_id = 0
        ORDER BY sim DESC, j ASC LIMIT 4
    ), q AS (
        SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
    )
    SELECT a.vec_id,
           {sr("list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[]))", 6)} AS sim
    FROM assigned a, q
    WHERE a.lst IN (SELECT j FROM qprobe) AND a.vec_id <> 0
    ORDER BY sim DESC NULLS LAST, a.vec_id ASC NULLS LAST
    LIMIT 10
    """,
)
def q_ivf_portable(spark, sf_dir):
    """IVF ANN top-10 with a deterministic seed codebook (centroids =
    embeddings of ids 0..15): list assignment is argmax of the rounded
    cosine with ties to the smallest centroid id, the query probes its 4
    nearest lists, exact ranking inside — every step reproducible by an
    independent engine from the same stored rows, so the result
    compares EXACTLY (the k-means q_ann_ivf stays rows-only: float
    iteration isn't cross-engine stable). Fifth portable proof: the IVF
    pattern's inverted lists + multiprobe now oracle-verified."""
    emb = T(spark, sf_dir, "embeddings")
    return S.ivf_portable_topk(emb, query_id=0, n_list=16, nprobe=4, k=10)


@query("q_ann_ivf")  # rows-only: coarse-quantizer pruning is approximate by design
def q_ann_ivf(spark, sf_dir):
    """IVF ANN top-10 (16 lists, 4 probed): nearest-centroid assignment via
    Arrow-batched numpy, exact ranking inside the probed lists. At scale
    the corpus is written partitioned by ivf_list → partition pruning.
    Recall vs the exact top-k asserted in tests."""
    emb = T(spark, sf_dir, "embeddings")
    qvec = query_vector(emb, 0)
    return S.ivf_topk(emb, qvec, k=10)


# -- text analysis ---------------------------------------------------------
@query(
    "q_text_tokens",
    oracle="""
    SELECT tok, count(*) AS n
    FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  t -> len(t) > 0)) AS tok
        FROM documents
    )
    GROUP BY tok
    """,
)
def q_text_tokens(spark, sf_dir):
    """Corpus token frequencies: tokenize → explode → count. The shuffle is
    keyed on token with map-side partial counts — the classic wordcount
    shape that scales linearly."""
    d = T(spark, sf_dir, "documents")
    return (
        d.select(F.explode(TX.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_token_count",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0)) AS n_tokens,
           n_chars
    FROM documents
    """,
)
def q_token_count(spark, sf_dir):
    """Per-document token counts (whitespace tokenizer)."""
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", TX.token_count("text").alias("n_tokens"), "n_chars")


@query(
    "q_bpe_tokens",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe,
           len(list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0)) AS n_ws
    FROM documents
    """,
)
def q_bpe_tokens(spark, sf_dir):
    """BPE-ish token estimate next to the whitespace count — the same
    RE2-portable extraction pattern runs in both engines."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.bpe_token_estimate("text").alias("n_bpe"),
        TX.token_count("text").alias("n_ws"),
    )


@query(
    "q_quality_score",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk
        FROM documents
    )
    SELECT doc_id,
           floor((0.4 * least(len(tk) / 100.0, 1.0)
             + 0.3 * (1.0 - CASE WHEN len(tk) > 0
                 THEN len(list_filter(tk, x -> x IN ('the','a','an','and','or','of','to','in','is','it')))::DOUBLE / len(tk)
                 ELSE 0.0 END)
             + 0.3 * least((CASE WHEN len(tk) > 0
                 THEN list_sum(list_transform(tk, x -> len(x)))::DOUBLE / len(tk)
                 ELSE 0.0 END) / 8.0, 1.0)) * 1000000.0 + 0.5) / 1000000.0 AS quality
    FROM t
    """,
)
def q_quality_score(spark, sf_dir):
    """Document quality scoring — closed-form composite of length, stopword
    ratio, and mean token length (mesin_spark.ext.text.quality_score)."""
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", TX.quality_score("text").alias("quality"))


#: DuckDB mirror of ext.text.lang_id — shared by q_lang_id and
#: q_lang_confusion (marker-score CTEs + fixed-tie-break argmax CASE).
_LANG_PRED_CTES = """
    t AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk
        FROM documents
    ), s AS (
        SELECT doc_id, lang,
               len(list_filter(tk, x -> x IN ('the','and','of','to','a','in','is','that'))) AS s_en,
               len(list_filter(tk, x -> x IN ('le','la','et','les','des','un','une','du'))) AS s_fr,
               len(list_filter(tk, x -> x IN ('el','de','que','y','la','en','los','se'))) AS s_es,
               len(list_filter(tk, x -> x IN ('der','die','und','den','das','nicht','von','ist'))) AS s_de,
               len(list_filter(tk, x -> x IN ('的','了','是','在','我','有','和','不'))) AS s_zh
        FROM t
    ), pred AS (
    SELECT doc_id, lang,
           CASE WHEN s_en > 0 AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_de AND s_en >= s_zh THEN 'en'
                WHEN s_fr > 0 AND s_fr >= s_en AND s_fr >= s_es AND s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
                WHEN s_es > 0 AND s_es >= s_en AND s_es >= s_fr AND s_es >= s_de AND s_es >= s_zh THEN 'es'
                WHEN s_de > 0 AND s_de >= s_en AND s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
                WHEN s_zh > 0 AND s_zh >= s_en AND s_zh >= s_fr AND s_zh >= s_es AND s_zh >= s_de THEN 'zh'
                ELSE 'und' END AS lang_pred
    FROM s
    )
"""


@query(
    "q_lang_id",
    oracle=f"""
    WITH {_LANG_PRED_CTES}
    SELECT doc_id, lang, lang_pred FROM pred
    """,
)
def q_lang_id(spark, sf_dir):
    """Heuristic language ID (marker-token argmax, fixed tie-break order) —
    deterministic, so fully oracle-checked despite being a 'classifier'."""
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", TX.lang_id("text").alias("lang_pred"))


@query(
    "q_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(
                       list_filter(string_split(text, ''), c -> length(c) > 0),
                       c -> CAST(unicode(c) AS BIGINT))),
               (h, c) -> (h * 131 + c) % 1000000007
           ) AS fp
    FROM documents
    """,
)
def q_fingerprint(spark, sf_dir):
    """Rolling polynomial document fingerprint — portable arithmetic
    (h·131+code mod 1e9+7), identical in any engine."""
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint("text").alias("fp"))


@query(
    "q_ngram_novelty",
    oracle=f"""
    WITH tk AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> len(t) > 0) AS w
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(list_distinct([
                   w[i] || ' ' || w[i + 1]
                   FOR i IN generate_series(1, len(w) - 1)
               ])) AS tok
        FROM tk WHERE len(w) >= 2
    ),
    first AS (SELECT tok, min(doc_id) AS first_id FROM g GROUP BY tok)
    SELECT g.doc_id, count(*) AS n_grams,
           {sr(
               "avg(CASE WHEN f.first_id = g.doc_id THEN 1.0 ELSE 0.0 END)", 6
           )} AS novelty
    FROM g JOIN first f ON g.tok = f.tok
    GROUP BY g.doc_id
    ORDER BY g.doc_id
    """,
)
def q_ngram_novelty(spark, sf_dir):
    """Corpus-order 2-gram novelty per document (ext/text.ngram_novelty):
    the fraction of a doc's distinct bigrams FIRST introduced by that
    doc — the is-new-data-still-adding-content curation diagnostic (the
    corpus-level view of Lee et al. 2021's memorization analysis),
    computable with no pair space at all: one distinct-gram explode, one
    gram-keyed min(id) groupBy (map-side partial agg), one keyed join
    back, one per-doc count — every exchange keyed and linear in the
    gram postings. Docs with <2 tokens carry no bigrams and are
    excluded (mirrored in the oracle)."""
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    return TX.ngram_novelty(d, "doc_id", "text", n=2).orderBy("doc_id")


@query(
    "q_hash_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN (CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT)) % 10000 < 9000
                THEN 'train' ELSE 'val' END AS split
    FROM documents
    """,
)
def q_hash_split(spark, sf_dir):
    """Deterministic train/val split by portable hash bucket (Knuth mix,
    exact int64 arithmetic — identical in any engine). Map-side only."""
    d = T(spark, sf_dir, "documents").select("doc_id")
    return P.hash_split(d, "doc_id", frac_train=0.9)


@query(
    "q_source_overlap",
    oracle="""
    WITH planted AS (
        SELECT source, text FROM documents
        UNION ALL
        SELECT source || '-mirror' AS source, text
        FROM documents WHERE doc_id % 4 = 0
    ),
    fp AS (
        SELECT DISTINCT source,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           list_filter(string_split(text, ''), c -> length(c) > 0),
                           c -> CAST(unicode(c) AS BIGINT))),
                   (h, c) -> (h * 131 + c) % 1000000007
               ) AS f
        FROM planted
    ),
    counts AS (SELECT source, count(*) AS n FROM fp GROUP BY source),
    shared AS (
        SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
        FROM fp a JOIN fp b ON a.f = b.f AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_shared,
           floor((n_shared::DOUBLE / ca.n) * 1000000.0 + 0.5) / 1000000.0 AS share_of_a,
           floor((n_shared::DOUBLE / cb.n) * 1000000.0 + 0.5) / 1000000.0 AS share_of_b
    FROM shared
    JOIN counts ca ON ca.source = source_a
    JOIN counts cb ON cb.source = source_b
    """,
)
def q_source_overlap(spark, sf_dir):
    """Cross-source duplicate-contamination matrix
    (ext/pipeline.source_overlap): distinct shared texts per source
    pair + each side's overlap share — the is-domain-B-a-mirror-of-A /
    did-eval-leak-into-train curation diagnostic. Mirrors of every 4th
    doc are planted under '<source>-mirror' (oracle-mirrored) so the
    fixture HAS cross-source duplicates with exact known shares. No
    document pair space: the self-join key is the text fingerprint,
    whose per-key fan-out is bounded by source CARDINALITY, and the
    per-source totals broadcast back (source-count-sized dims)."""
    raw = T(spark, sf_dir, "documents").select("source", "text", "doc_id")
    mirror = raw.filter(F.col("doc_id") % 4 == 0).select(
        F.concat(F.col("source"), F.lit("-mirror")).alias("source"), "text"
    )
    planted = raw.select("source", "text").unionByName(mirror)
    return P.source_overlap(planted, "source", "text").orderBy(
        "source_a", "source_b"
    )


@query(
    "q_dedup_softweight",
    oracle="""
    WITH dup AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000000000 AS doc_id, text
        FROM documents WHERE doc_id % 10 = 0
    ),
    fp AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           list_filter(string_split(text, ''), c -> length(c) > 0),
                           c -> CAST(unicode(c) AS BIGINT))),
                   (h, c) -> (h * 131 + c) % 1000000007
               ) AS f
        FROM dup
    )
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY f) AS cluster_id,
           count(*) OVER (PARTITION BY f) AS n_copies,
           floor((1.0 / count(*) OVER (PARTITION BY f)) * 1000000.0 + 0.5)
               / 1000000.0 AS weight
    FROM fp
    """,
)
def q_dedup_softweight(spark, sf_dir):
    """Soft deduplication (ext/pipeline.soft_dedup_weights): every row
    kept, training weight 1/n_copies per duplicate cluster — the
    reweight-don't-delete third member of the dedup triple (drop =
    q_dedup_exact, suppress-worse = q_dedup_suppress, reweight = this).
    Clones planted at doc_id+1e12 guarantee multi-member clusters whose
    members must all carry weight 0.5. One window shuffle keyed by the
    portable text fingerprint, mirrored exactly in the oracle."""
    raw = T(spark, sf_dir, "documents").select("doc_id", "text")
    clones = raw.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000_000_000).alias("doc_id"), "text"
    )
    return P.soft_dedup_weights(
        raw.unionByName(clones), "doc_id", "text"
    ).orderBy("doc_id")


@query(
    "q_split_leakage_safe",
    oracle="""
    WITH dup AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000000000 AS doc_id, text
        FROM documents WHERE doc_id % 10 = 0
    ),
    fp AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           list_filter(string_split(text, ''), c -> length(c) > 0),
                           c -> CAST(unicode(c) AS BIGINT))),
                   (h, c) -> (h * 131 + c) % 1000000007
               ) AS f
        FROM dup
    ),
    cl AS (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY f) AS cluster_id FROM fp
    )
    SELECT doc_id, cluster_id,
           CASE WHEN (CAST((CAST(cluster_id AS HUGEINT) * 2654435761)
                      % 4294967296 AS BIGINT)) % 10000 < 9000
                THEN 'train' ELSE 'val' END AS split
    FROM cl
    """,
)
def q_split_leakage_safe(spark, sf_dir):
    """Duplicate-cluster-aware train/val split
    (ext/pipeline.leakage_safe_split): the split bucket is computed on
    the CLUSTER id (min doc_id over identical text), so a document and
    its verbatim copy can never straddle the train/val cut — the eval-
    leakage failure plain q_hash_split has by construction (Lee et al.
    2021's dedup-before-split motivation). Clones planted at
    doc_id+1e12 (the q_dedup_exact pattern, mirrored in the oracle)
    guarantee the fixture HAS multi-member clusters, and exactly those
    pairs must agree on the split. One window shuffle keyed by the
    portable text fingerprint; singleton clusters split exactly like
    q_hash_split. Same-split invariant additionally pytest-asserted."""
    raw = T(spark, sf_dir, "documents").select("doc_id", "text")
    clones = raw.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000_000_000).alias("doc_id"), "text"
    )
    return P.leakage_safe_split(
        raw.unionByName(clones), "doc_id", "text", frac_train=0.9
    ).orderBy("doc_id")


@query(
    "q_token_budget",
    oracle="""
    WITH t AS (
        SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk
        FROM documents
    ), scored AS (
        SELECT floor((0.4 * least(len(tk) / 100.0, 1.0)
             + 0.3 * (1.0 - CASE WHEN len(tk) > 0
                 THEN len(list_filter(tk, x -> x IN ('the','a','an','and','or','of','to','in','is','it')))::DOUBLE / len(tk)
                 ELSE 0.0 END)
             + 0.3 * least((CASE WHEN len(tk) > 0
                 THEN list_sum(list_transform(tk, x -> len(x)))::DOUBLE / len(tk)
                 ELSE 0.0 END) / 8.0, 1.0)) * 1000000.0 + 0.5) / 1000000.0 AS qbin,
            len(tk) AS nt
        FROM t
    ), bins AS (
        SELECT qbin, sum(nt) AS toks, count(*) AS docs FROM scored GROUP BY qbin
    ), cum AS (
        SELECT qbin, toks, docs,
               coalesce(sum(toks) OVER (
                   ORDER BY qbin DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before_toks
        FROM bins
    ), tot AS (SELECT sum(toks) AS tt, sum(docs) AS td FROM bins)
    SELECT min(CASE WHEN before_toks < 0.5 * tt THEN qbin END) AS threshold,
           CAST(coalesce(sum(CASE WHEN before_toks < 0.5 * tt THEN docs END), 0) AS BIGINT) AS kept_docs,
           CAST(coalesce(sum(CASE WHEN before_toks < 0.5 * tt THEN toks END), 0) AS BIGINT) AS kept_tokens,
           CAST(max(td) AS BIGINT) AS total_docs,
           CAST(max(tt) AS BIGINT) AS total_tokens
    FROM cum CROSS JOIN tot
    """,
)
def q_token_budget(spark, sf_dir):
    """Token-budget quality threshold
    (ext/pipeline.token_budget_threshold): find the quality-score
    threshold that keeps HALF the corpus tokens, highest quality first
    — the FineWeb/DCLM keep-top-fraction-by-score curation step as one
    exact-oracle report row. The plan is the 100 TB shape: one
    partial-combined corpus aggregate into a BOUNDED quality-bin table
    (≤10^6+1 rows at 6-dp rounding, whatever the corpus size), then a
    cumulative window over the bins only — never a global sort or a
    corpus-wide running sum. Bin-granular keep semantics make the
    report engine-independent (no within-bin tie order), and the DuckDB
    oracle replays the identical binning, window, and budget cut."""
    d = T(spark, sf_dir, "documents")
    return P.token_budget_threshold(d, budget_frac=0.5)


@query(
    "q_scrub_text",
    oracle="""
    SELECT doc_id,
           regexp_replace(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\\+?[0-9][0-9()\\-\\s]{6,}[0-9]', '[PHONE]', 'g') AS scrubbed
    FROM documents
    """,
)
def q_scrub_text(spark, sf_dir):
    """PII scrubbing: redact emails and phone-ish digit runs — map-side
    regexp_replace, no shuffle."""
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", P.scrub_text("text").alias("scrubbed"))


@query(
    "q_stratified_sample",
    oracle="""
    SELECT doc_id, source
    FROM documents
    WHERE (CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT)) % 10000 <
          CASE WHEN source = 'src0' THEN 10000
               WHEN source = 'src1' THEN 5000
               ELSE 1000 END
    """,
)
def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling by portable hash bucket: keep 100%
    of src0, 50% of src1, 10% of everything else — the corpus
    mixing/rebalancing primitive, reproducible across engines and appends.
    Map-side CASE-filter, no shuffle."""
    d = T(spark, sf_dir, "documents").select("doc_id", "source")
    return P.stratified_sample(
        d, "source", {"src0": 1.0, "src1": 0.5}, "doc_id", default_fraction=0.1
    )


@query(
    "q_chunk_docs",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk
        FROM documents
    ), s AS (
        SELECT doc_id, tk,
               range(0, greatest(ceil((len(tk) - 64) / 48.0), 0)::BIGINT + 1) AS starts
        FROM t
    )
    SELECT doc_id, i AS chunk_id,
           array_to_string(tk[i*48+1 : i*48+64], ' ') AS chunk_text,
           least(len(tk) - i*48, 64) AS n_tokens
    FROM s, unnest(starts) AS u(i)
    """,
)
def q_chunk_docs(spark, sf_dir):
    """Pre-training document chunker: overlapping 64-token windows, stride
    48, final partial window kept. Map-side explode, linear scan."""
    d = T(spark, sf_dir, "documents")
    return P.chunk_documents(d, chunk_tokens=64, stride=48)


@query(
    "q_clusters_portable",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_PORTABLE_CTES},
    pairs AS (
        SELECT c.id_a, c.id_b
        FROM cands c
        JOIN fps fa ON fa.doc_id = c.id_a
        JOIN fps fb ON fb.doc_id = c.id_b
        WHERE floor((len(list_intersect(fa.f, fb.f))::DOUBLE
              / len(list_distinct(list_concat(fa.f, fb.f)))) * 1000000.0 + 0.5) / 1000000.0 >= 0.7
    ), und AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ), nds AS (
        SELECT DISTINCT src AS node FROM und
    ), reach(node, lbl) AS (
        SELECT node, node FROM nds
        UNION
        SELECT u.dst, r.lbl FROM reach r JOIN und u ON u.src = r.node
    )
    SELECT node, CAST(min(lbl) AS BIGINT) AS canonical_id
    FROM reach GROUP BY node
    ORDER BY node
    """,
)
def q_clusters_portable(spark, sf_dir):
    """Connected-component canonicalization over the PORTABLE MinHash
    pair set — with a deterministic cross-engine pair list, the cluster
    map itself becomes exactly checkable: the oracle closes the
    reachability transitively with a recursive CTE and takes each
    component's minimum id, which is precisely what the min-label
    pointer-jumping loop converges to. The engine-native
    q_dedup_clusters stays rows-only (its pairs come from xxhash64
    sketches); this is the iterative-algorithm tier's cross-engine
    proof."""
    dup = _docs_with_dups(spark, sf_dir).select("doc_id", "text")
    pairs = D.minhash_lsh_portable(dup, "doc_id", threshold=0.7)
    return D.dedup_clusters(pairs).orderBy("node")


@query("q_dedup_clusters")  # rows-only: iterative algorithm (non-SQL-expressible)
def q_dedup_clusters(spark, sf_dir):
    """Near-dup cluster canonicalization: connected components (min-label
    propagation) over the MinHash-LSH pair set; every doc maps to its
    cluster's surviving id. Correctness on chains asserted in tests."""
    dup = _docs_with_dups(spark, sf_dir).select("doc_id", "text")
    pairs = D.minhash_lsh_dedup(dup, "doc_id", threshold=0.7)
    return D.dedup_clusters(pairs).orderBy("node")


@query(
    "q_tfidf",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                          t -> len(t) > 0)) AS tok
        FROM documents
    ), tf AS (
        SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok
    ), dft AS (
        SELECT tok, count(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok
    ), total AS (
        SELECT count(DISTINCT doc_id) AS n_docs FROM documents
    )
    SELECT tf.doc_id, tf.tok, tf.tf,
           floor((tf.tf * (ln((total.n_docs + 1) / (dft.df + 1.0)) + 1)) * 1000000.0 + 0.5) / 1000000.0 AS tfidf
    FROM tf JOIN dft ON tf.tok = dft.tok CROSS JOIN total
    """,
)
def q_tfidf(spark, sf_dir):
    """Corpus TF-IDF (smooth idf): two keyed shuffles with map-side partial
    aggregation, token-frequency side broadcast into the join."""
    d = T(spark, sf_dir, "documents")
    return TX.tf_idf(d)


@query(
    "q_pipeline_e2e",
    oracle="""
    WITH scrubbed AS (
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                   '\\+?[0-9][0-9()\\-\\s]{6,}[0-9]', '[PHONE]', 'g') AS text
        FROM documents
    ), toks AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk
        FROM scrubbed
    ), lang AS (
        SELECT doc_id, text, tk,
               len(list_filter(tk, x -> x IN ('the','and','of','to','a','in','is','that'))) AS s_en,
               len(list_filter(tk, x -> x IN ('le','la','et','les','des','un','une','du'))) AS s_fr,
               len(list_filter(tk, x -> x IN ('el','de','que','y','la','en','los','se'))) AS s_es,
               len(list_filter(tk, x -> x IN ('der','die','und','den','das','nicht','von','ist'))) AS s_de,
               len(list_filter(tk, x -> x IN ('的','了','是','在','我','有','和','不'))) AS s_zh
        FROM toks
    ), filtered AS (
        SELECT doc_id, text, tk FROM lang
        WHERE s_en > 0 AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_de AND s_en >= s_zh
          AND floor((0.4 * least(len(tk) / 100.0, 1.0)
                + 0.3 * (1.0 - CASE WHEN len(tk) > 0
                    THEN len(list_filter(tk, x -> x IN ('the','a','an','and','or','of','to','in','is','it')))::DOUBLE / len(tk)
                    ELSE 0.0 END)
                + 0.3 * least((CASE WHEN len(tk) > 0
                    THEN list_sum(list_transform(tk, x -> len(x)))::DOUBLE / len(tk)
                    ELSE 0.0 END) / 8.0, 1.0)) * 1000000.0 + 0.5) / 1000000.0 >= 0.5
    ), dedup AS (
        SELECT text, min(doc_id) AS doc_id FROM filtered GROUP BY text
    ), survivors AS (
        SELECT d.doc_id, f.tk FROM dedup d JOIN filtered f ON f.doc_id = d.doc_id
    ), chunks AS (
        SELECT doc_id, i AS chunk_id, least(len(tk) - i*48, 64) AS n_tokens
        FROM (
            SELECT doc_id, tk,
                   range(0, greatest(ceil((len(tk) - 64) / 48.0), 0)::BIGINT + 1) AS starts
            FROM survivors
        ) s, unnest(starts) AS u(i)
    )
    SELECT doc_id, chunk_id, n_tokens,
           CASE WHEN (CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT)) % 10000 < 9000
                THEN 'train' ELSE 'val' END AS split
    FROM chunks
    """,
)
def q_pipeline_e2e(spark, sf_dir):
    """End-to-end training-data pipeline composed from the engine's own
    operators: PII scrub → language filter (en) → quality gate (≥0.5) →
    exact dedup (keep min id) → 64/48 token chunking → deterministic
    train/val split. One declarative plan: the only shuffles are the dedup
    groupBy and its survivor join — everything else stays map-side.

    ROUND-13 REVERT of the round-12 unconditional raw-corpus
    repartition: the driver's cold-JVM bench measured it a 27%
    REGRESSION at sf0.1 (1.571 → 1.995 s) and the 100x probe showed it
    doubling the op's shuffle bytes (7.6 → 15.8 MiB) for no wall win —
    an exchange of the entire raw corpus is never a no-op, and at 100 TB
    a many-file ingest already arrives scan-parallel (the same reasoning
    that kept spreads out of the TPC-H plans). The sf0.1 single-task
    scan is a fixture-layout artifact, fixed at the source this round
    (multi-row-group fixtures), not in the plan."""
    d = T(spark, sf_dir, "documents")
    scrubbed = d.select("doc_id", P.scrub_text("text").alias("text"))
    # one signal fold evaluates both gate predicates (see text.pipeline_keep)
    filtered = scrubbed.filter(TX.pipeline_keep("text", "en", 0.5))
    survivors = D.exact_dedup(filtered, ["text"], "doc_id").select("doc_id", "text")
    chunks = P.chunk_documents(survivors, chunk_tokens=64, stride=48)
    return P.hash_split(chunks, "doc_id", frac_train=0.9).select(
        "doc_id", "chunk_id", "n_tokens", "split"
    )


# -- multimodal + streaming (rows-only) ------------------------------------
@query("q_multimodal")  # rows-only: binary plumbing + pandas feature extraction
def q_multimodal(spark, sf_dir):
    """Multimodal column plumbing: binary payload + metadata struct →
    mapInPandas feature extraction (deterministic fake decode for txt;
    real pure-Python codecs for wav/ppm)."""
    d = T(spark, sf_dir, "documents")
    # fixture payloads are all decodable; drop the (all-NULL) quarantine
    # column so the certified output schema stays stable
    return (
        M.extract_features(M.attach_binary(d))
        .select("doc_id", "format", "n_bytes", "checksum", "feature_mean")
        .orderBy("doc_id")
    )


@query("q_multimodal_audio")  # rows-only: real binary codec path (RIFF/WAV)
def q_multimodal_audio(spark, sf_dir):
    """Real-codec multimodal path end-to-end: synthesize a deterministic
    WAV payload per document (sine tone keyed on doc_id), decode it with
    the pure-Python RIFF PCM reader, and extract duration/rms audio
    features — all inside partition-preserving mapInPandas stages (no
    shuffle; the 100 TB shape for media feature extraction)."""
    d = T(spark, sf_dir, "documents").limit(500)
    return (
        M.extract_audio_features(M.synth_wav(d))
        .select("doc_id", "n_samples", "sample_rate", "duration_s", "rms")
        .orderBy("doc_id")
    )


@query("q_stream_tumbling")  # rows-only: streaming execution path
def q_stream_tumbling(spark, sf_dir):
    """Structured Streaming: file source → watermark → tumbling windowed
    aggregation → memory sink, driven to completion. Must equal
    q_tumbling_batch's rows (asserted in tests/test_streaming.py)."""
    stream = STR.read_events_stream(spark, sf_dir)
    agg = STR.windowed_counts(stream, window="1 hour", watermark="30 minutes")
    return STR.run_to_memory(agg, "q_stream_tumbling_out", output_mode="append")


@query(
    "q_stream_dedup",
    # the streamed result is deterministic and complete (single finite
    # file -> one micro-batch; event_id is unique so dedup passes every
    # row through), so the streaming PATH itself is oracle-checked
    oracle="SELECT event_id, event_type, user_id FROM events",
)
def q_stream_dedup(spark, sf_dir):
    """Streaming exact dedup with watermark-bounded state
    (dropDuplicatesWithinWatermark on event_id) — row count must equal the
    batch distinct count (asserted in tests/test_streaming.py)."""
    stream = STR.read_events_stream(spark, sf_dir)
    deduped = STR.dedup_within_watermark(stream, watermark="30 minutes").select(
        "event_id", "event_type", "user_id"
    )
    return STR.run_to_memory(deduped, "q_stream_dedup_out", output_mode="append").orderBy(
        "event_id"
    )


@query("q_stream_stateful")  # rows-only: custom stateful operator
def q_stream_stateful(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running totals with explicit state. Final per-user state must equal the
    batch aggregate (asserted in tests/test_streaming.py)."""
    stream = STR.read_events_stream(spark, sf_dir)
    out = STR.run_to_memory(
        STR.running_totals_stream(stream), "q_stream_stateful_out", output_mode="update"
    )
    # update-mode emits one row per state change; the FINAL state is the
    # emission with the highest n_events (monotone counter) — max_by, not
    # max(total_value), which would return a stale intermediate total if
    # a later batch carried negative values (refunds/corrections)
    latest = out.groupBy("user_id").agg(
        F.max_by(
            F.struct(F.col("n_events"), F.col("total_value")), F.col("n_events")
        ).alias("_s")
    ).select("user_id", F.col("_s.n_events").alias("n_events"),
             F.col("_s.total_value").alias("total_value"))
    return latest.orderBy("user_id")


@query("q_stream_rate")  # rows-only: wall-clock latency telemetry
def q_stream_rate(spark, sf_dir):
    """Streaming rate/latency harness: events split into 6 files, streamed
    2 files per trigger through the watermarked tumbling aggregation, one
    row per micro-batch from Spark's own StreamingQueryProgress telemetry
    (trigger wall-time = emission latency, input rows, rows/sec, state-store
    rows). Values are wall-clock (rows-only by nature); the invariants —
    multiple batches, input-row conservation, bounded state — are asserted
    in tests/test_streaming.py."""
    rows = STR.measure_stream_latency(spark, sf_dir)
    return spark.createDataFrame(
        [
            (
                r["batch_id"],
                r["input_rows"],
                r["trigger_ms"],
                r["add_batch_ms"],
                float(r["rows_per_sec"]),
                r["state_rows"],
            )
            for r in rows
        ],
        "batch_id long, input_rows long, trigger_ms long, add_batch_ms long, "
        "rows_per_sec double, state_rows long",
    ).orderBy("batch_id")


@query("q_stream_sliding")  # rows-only: streaming execution path
def q_stream_sliding(spark, sf_dir):
    """Streaming sliding windows (30min/15min) with watermark — each event
    contributes to two windows; closed windows must match q_sliding_batch
    (asserted in tests/test_streaming.py)."""
    stream = STR.read_events_stream(spark, sf_dir)
    agg = STR.windowed_counts(
        stream, window="30 minutes", watermark="30 minutes", slide="15 minutes"
    )
    return STR.run_to_memory(agg, "q_stream_sliding_out", output_mode="append")


@query("q_stream_session")  # rows-only: streaming execution path
def q_stream_session(spark, sf_dir):
    """Streaming session windows (10-minute gap) per user — merging session
    state under a watermark; closed sessions must match q_session_batch
    (asserted in tests/test_streaming.py)."""
    stream = STR.read_events_stream(spark, sf_dir)
    agg = STR.session_counts(stream, gap="10 minutes", watermark="30 minutes")
    return STR.run_to_memory(agg, "q_stream_session_out", output_mode="append")


@query(
    "q_stream_join",
    # stream-stream INNER joins emit eagerly on match (no watermark wait),
    # so a finite single-batch input yields the complete deterministic
    # join — checkable against the plain SQL join
    oracle="""
    SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
           CAST(floor(epoch(c.ts)) AS BIGINT)
             - CAST(floor(epoch(p.ts)) AS BIGINT) AS gap_s
    FROM events p JOIN events c ON p.user_id = c.user_id
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 1 HOUR
    """,
)
def q_stream_join(spark, sf_dir):
    """Stream-stream inner join with two-sided event-time bounds and
    watermarks (clicks within 1h after a purchase, same user) — the state
    expires, making it viable unbounded. Must equal the batch join
    (asserted in tests/test_streaming.py)."""
    ev1 = STR.read_events_stream(spark, sf_dir)
    ev2 = STR.read_events_stream(spark, sf_dir)
    joined = STR.purchase_click_join(
        ev1.filter(F.col("event_type") == "purchase"),
        ev2.filter(F.col("event_type") == "click"),
    )
    return STR.run_to_memory(joined, "q_stream_join_out", output_mode="append").orderBy(
        "purchase_id", "click_id"
    )


@query(
    "q_stream_enrich",
    # pass-through enrichment: every event emits exactly once in append
    # mode, so the streamed output equals the batch join
    oracle="""
    SELECT event_id, user_id,
           'segment_' || CAST((user_id % 10) % 3 AS VARCHAR) AS segment
    FROM events
    """,
)
def q_stream_enrich(spark, sf_dir):
    """Stream-static enrichment: the event stream joins a static segment
    dimension (broadcast per micro-batch, no state store) — the
    reference-data-attach pattern. Must equal the batch join (asserted in
    tests/test_streaming.py)."""
    stream = STR.read_events_stream(spark, sf_dir)
    dim = spark.createDataFrame(
        [(i, f"segment_{i % 3}") for i in range(10)], "seg_key long, segment string"
    )
    enriched = STR.enrich_with_static(
        stream.withColumn("seg_key", F.col("user_id") % 10), dim, "seg_key"
    ).select("event_id", "user_id", "segment")
    return STR.run_to_memory(enriched, "q_stream_enrich_out", output_mode="append").orderBy(
        "event_id"
    )


# SURVEY.md §2.11 names the MinHash-LSH near-dup row "q_dedup_near";
# register the same query under that id so the §2 checklist maps 1:1.
@query("q_dedup_near")  # rows-only: xxhash64-based sketches are Spark-native
def q_dedup_near(spark, sf_dir):
    """Alias of q_dedup_minhash under the SURVEY §2.11 query id."""
    return q_dedup_minhash(spark, sf_dir)


@query("q_stream_join_outer")  # rows-only: emission depends on the watermark rule
def q_stream_join_outer(spark, sf_dir):
    """Stream-stream LEFT OUTER join (clicks within 1h after a purchase):
    unmatched purchases emit null-click rows only once the watermark
    passes their join window — the deferred-null semantics that
    distinguish outer stream joins from their batch form (globally-last
    unmatched rows legitimately stay in state on a finite replay, so
    rows-only here). tests/test_streaming.py derives the exact expected
    emission set from the watermark rule and asserts equality."""
    ev1 = STR.read_events_stream(spark, sf_dir)
    ev2 = STR.read_events_stream(spark, sf_dir)
    joined = STR.purchase_click_left_join(
        ev1.filter(F.col("event_type") == "purchase"),
        ev2.filter(F.col("event_type") == "click"),
    )
    return STR.run_to_memory(
        joined, "q_stream_join_outer_out", output_mode="append"
    ).orderBy("purchase_id", "click_id")


@query(
    "q_lang_confusion",
    oracle=f"""
    WITH {_LANG_PRED_CTES}
    SELECT lang AS lang_true, lang_pred, count(*) AS n,
           {sr("count(*)::DOUBLE / sum(count(*)) OVER (PARTITION BY lang)", 6)}
               AS frac_of_true
    FROM pred
    GROUP BY lang, lang_pred
    ORDER BY lang_true, lang_pred
    """,
)
def q_lang_confusion(spark, sf_dir):
    """In-engine classifier evaluation: the language-ID confusion matrix
    against the labeled lang column, with each cell's share of its true
    class (diagonal cells = per-class recall). One (true, pred) hash agg
    over the map-side classifier output + a |classes|-row normalization
    window — the eval pattern every pipeline model check reuses, at
    corpus scale for the price of a groupBy."""
    from pyspark.sql import Window as W

    from mesin_spark.functions import stable_round as R

    d = T(spark, sf_dir, "documents")
    pred = d.select(F.col("lang").alias("lang_true"), TX.lang_id("text").alias("lang_pred"))
    cells = pred.groupBy("lang_true", "lang_pred").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("lang_true")
    return cells.select(
        "lang_true",
        "lang_pred",
        "n",
        R(F.col("n") / F.sum("n").over(w), 6).alias("frac_of_true"),
    ).orderBy("lang_true", "lang_pred")


@query(
    "q_unicode_normalize",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               text || repeat('e' || chr(769), (doc_id % 3) + 1) AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(length(t) AS BIGINT) AS len_raw,
           CAST(length(nfc_normalize(t)) AS BIGINT) AS len_nfc,
           right(nfc_normalize(t), 4) AS tail_nfc
    FROM raw
    """,
)
def q_unicode_normalize(spark, sf_dir):
    """Unicode NFC normalization (ext/text.nfc_normalize — Arrow-batched
    pandas_udf; Spark has no JVM unicode-normalize builtin): the corpus
    is ASCII, so a per-doc decomposed suffix ('e'+COMBINING ACUTE,
    repeated doc_id%3+1 times) is appended deterministically; NFC must
    compose every pair into U+00E9, shrinking the length by exactly the
    repeat count and leaving 'é' runs on the tail. Cross-engine exact
    vs DuckDB's nfc_normalize — both implement Unicode canonical
    composition. Map-side only; at 100 TB this is a plain projection
    with Arrow batch-transfer overhead, no shuffle."""
    from mesin_spark.ext.text import nfc_normalize

    d = T(spark, sf_dir, "documents")
    decomposed = "e\u0301"  # LATIN SMALL E + COMBINING ACUTE (2 codepoints)
    raw = F.concat(
        F.col("text"),
        F.repeat(F.lit(decomposed), (F.col("doc_id") % 3 + 1).cast("int")),
    )
    t = d.select("doc_id", raw.alias("t"), nfc_normalize(raw).alias("n"))
    return t.select(
        "doc_id",
        F.length("t").cast("bigint").alias("len_raw"),
        F.length("n").cast("bigint").alias("len_nfc"),
        F.expr("right(n, 4)").alias("tail_nfc"),
    )


@query(
    "q_tfidf_pairs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, tok, count(*)::DOUBLE AS tf
        FROM (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                      t -> len(t) > 0)) AS tok
            FROM documents
        )
        GROUP BY 1, 2
    ),
    n AS (SELECT count(DISTINCT doc_id)::DOUBLE AS nd FROM toks),
    dfq AS (SELECT tok, count(*)::DOUBLE AS df FROM toks GROUP BY tok
            HAVING count(*) <= 1000),
    w AS (
        SELECT doc_id, t.tok, tf * ln((SELECT nd FROM n) / df) AS wt
        FROM toks t JOIN dfq USING (tok)
    ),
    nrm AS (SELECT doc_id, sqrt(sum(wt * wt)) AS nr FROM w GROUP BY doc_id),
    dots AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.wt * b.wt) AS dp
        FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           {sr("dp / (na.nr * nb.nr)", 6)} AS sim
    FROM dots
    JOIN nrm na ON na.doc_id = id_a
    JOIN nrm nb ON nb.doc_id = id_b
    WHERE {sr("dp / (na.nr * nb.nr)", 6)} >= 0.85
    """,
)
def q_tfidf_pairs(spark, sf_dir):
    """Pairwise TF-IDF cosine document similarity through an
    inverted-index join (ext/text.tfidf_pair_sims) — the SPARSE sibling
    of q_dedup_embed: documents meet only through shared terms, so the
    pair space is Σ df² over the vocabulary, not n² over the corpus.
    That bound is only linear if df is CAPPED: max_df=1000 (mirrored as
    HAVING in the oracle) makes the postings fan-out ≤ max_df·Σdf =
    1000 × total postings — terms in >1000 documents are treated as
    stopwords for pair generation, the standard sparse-similarity knob
    (sklearn/Spark-ML max_df). Found live: without the cap the 100x
    corpus's ~5000-df per-shard hub terms put ~1e11 rows through the
    postings self-join (never finishes); with it the same corpus
    completes. At the driver's certification scales every df ≤ N ≤ 500,
    so the cap changes nothing there. Corpus size rides a broadcast
    1-row frame; per-doc norms fold before the pair join; sim rounds
    to 6 dp BEFORE thresholding on both engines."""
    from mesin_spark.ext.text import tfidf_pair_sims

    d = T(spark, sf_dir, "documents")
    return tfidf_pair_sims(d, threshold=0.85, max_df=1000).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        "sim",
    )
