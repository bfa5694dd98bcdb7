"""Round-2 wave 3 — embedding-pipeline operators: k-NN join (batch ANN
companion), per-dimension corpus statistics, and Johnson-Lindenstrauss
random projection with engine-portable deterministic signs.

Charter tier (similarity search / training-data pipeline); the reference
has no array/vector surface at all. All vector math is JVM higher-order
functions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mesin_spark.ext import similarity as S
from mesin_spark.queries import R, T, query, sr

#: Knuth multiplicative constant and a second odd mix constant
#: (xxhash prime2) for the 2-D sign hash; portable exact-int arithmetic.
_KNUTH = 2654435761
_PRIME2 = 2246822519


@query(
    "q_knn_join",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5
    ), s AS (
        SELECT q.q_id, b.vec_id,
               {sr("list_cosine_similarity(CAST(b.embedding AS DOUBLE[]), CAST(q.q_emb AS DOUBLE[]))", 6)} AS sim
        FROM embeddings b, q
        WHERE b.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, sim, "rank" FROM (
        SELECT q_id, vec_id, sim,
               row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS "rank"
        FROM s
    ) WHERE "rank" <= 3
    """,
)
def q_knn_join(spark, sf_dir):
    """Batch k-NN join: top-3 cosine neighbors for each of 5 query vectors
    in ONE corpus scan (query side broadcast, two-phase per-query top-k —
    see similarity.knn_join for the shuffle-spreading shape)."""
    emb = T(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return S.knn_join(emb, queries, k=3)


@query(
    "q_embed_stats",
    oracle=f"""
    SELECT i AS dim, {sr("avg(v)", 6)} AS mu, {sr("stddev_samp(v)", 6)} AS sigma,
           {sr("min(v)", 6)} AS lo, {sr("max(v)", 6)} AS hi
    FROM (
        SELECT generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    )
    GROUP BY i
    """,
)
def q_embed_stats(spark, sf_dir):
    """Per-dimension corpus statistics (mean/std/min/max over each of the
    64 embedding dimensions) — the normalization/whitening precursor and
    drift monitor for an embedding pipeline. posexplode + one partial-agg
    shuffle on the 64-value dim key; linear scan, no corpus shuffle."""
    emb = T(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("pos", "v")).select(
        (F.col("pos") + 1).alias("dim"), F.col("v").cast("double").alias("v")
    )
    return ex.groupBy("dim").agg(
        R(F.avg("v"), 6).alias("mu"),
        R(F.stddev_samp("v"), 6).alias("sigma"),
        R(F.min("v"), 6).alias("lo"),
        R(F.max("v"), 6).alias("hi"),
    )


@query("q_embed_pca")  # rows-only: eigendecomposition has no SQL mirror
def q_embed_pca(spark, sf_dir):
    """PCA whitening of the embedding table (ext/pca.py) — the standard
    preprocessing step of embedding-dedup pipelines (whitened vectors
    keep one dominant direction from swamping every cosine). Fit: exact
    covariance from per-partition partial Gram matrices (one Arrow
    batch-reduced row per partition, bounded collect — measured 3.6s vs
    30s for the 2080-column JVM-aggregate formulation at d=64), eigh on
    the d x d result driver-side, sign-canonicalized components. Apply:
    a literal-matrix codegen projection, no Python per row. Whitening
    invariants (unit variance per component, cross-component correlation
    ~0, agreement with a pure-numpy reference to rounding precision) are
    asserted in tests/test_pca.py."""
    from mesin_spark.ext.pca import pca_model, pca_project

    emb = T(spark, sf_dir, "embeddings")
    model = pca_model(emb, k=8, whiten=True)
    return pca_project(emb, model, round_to=4).orderBy("vec_id")


def _pca_portable_oracle(
    rounds: int = 8,
    dim: int = 64,
    q_scale: int = 10**4,
    g_div: int = 10**6,
    v_scale: int = 10**6,
) -> str:
    """Unrolled-round DuckDB mirror of ext/pca.pca_portable_pc1 — the
    same MATERIALIZED-CTE strategy as the ppr/pagerank portable oracles:
    quantize, integer Gram, ``rounds`` power-iteration steps in
    truncating integer division (DuckDB `//` == Spark `div`), sign
    canonicalization, literal projection. DuckDB's BIGINT sums widen to
    HUGEINT, so every aggregate is cast back down (round-2 caveat);
    overflow guards live on the Spark/driver side (same numbers)."""
    d1 = dim + 1
    parts = [
        f"""xq AS MATERIALIZED (
        SELECT vec_id, i,
               CAST(floor(CAST(embedding[i] AS DOUBLE) * {q_scale}.0 + 0.5) AS BIGINT) AS x
        FROM embeddings, range(1, {d1}) t(i)
    )""",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)",
        "sx AS MATERIALIZED (SELECT i, CAST(sum(x) AS BIGINT) AS s FROM xq GROUP BY i)",
        """sxy AS MATERIALIZED (
        SELECT a.i AS j, b.i AS i, CAST(sum(a.x * b.x) AS BIGINT) AS p
        FROM xq a JOIN xq b ON a.vec_id = b.vec_id
        GROUP BY a.i, b.i
    )""",
        f"""g AS MATERIALIZED (
        SELECT sxy.j, sxy.i,
               CAST((nn.n * sxy.p - sj.s * si.s) // {g_div} AS BIGINT) AS gv
        FROM sxy
        CROSS JOIN nn
        JOIN sx sj ON sj.i = sxy.j
        JOIN sx si ON si.i = sxy.i
    )""",
        f"v0 AS (SELECT i, CAST({v_scale} AS BIGINT) AS v FROM range(1, {d1}) t(i))",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""w{r} AS MATERIALIZED (
        SELECT g.j AS i, CAST(sum(g.gv * v{r - 1}.v) AS BIGINT) AS w
        FROM g JOIN v{r - 1} ON v{r - 1}.i = g.i
        GROUP BY g.j
    )"""
        )
        parts.append(
            f"m{r} AS (SELECT CAST(max(abs(w)) // {v_scale} AS BIGINT) AS d FROM w{r})"
        )
        parts.append(
            f"v{r} AS MATERIALIZED (SELECT i, CAST(w // d AS BIGINT) AS v "
            f"FROM w{r} CROSS JOIN m{r})"
        )
    parts.append(
        f"""sgn AS (
        SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS s
        FROM v{rounds} ORDER BY abs(v) DESC, i ASC LIMIT 1
    )"""
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT xq.vec_id,
           CAST(sum((nn.n * xq.x - sx.s) * (v{rounds}.v * sgn.s)) AS BIGINT) AS pc1_fp
    FROM xq
    JOIN sx ON sx.i = xq.i
    JOIN v{rounds} ON v{rounds}.i = xq.i
    CROSS JOIN nn
    CROSS JOIN sgn
    GROUP BY xq.vec_id
    ORDER BY vec_id
    """
    )


def _kmeans_portable_oracle(
    k: int = 8, rounds: int = 3, dim: int = 64, q_scale: int = 10**4
) -> str:
    """Unrolled-round DuckDB mirror of ext/kmeans.kmeans_portable_assign:
    quantize, seed centroids = ids 0..k-1, per round an n×k integer-L2
    argmin (row_number ordered (dist, centroid id) — the smallest-id tie
    rule array_position gives Spark) and a truncating-division centroid
    mean (DuckDB `//` == Spark `div`; emptied clusters keep their
    previous centroid via the LEFT JOIN coalesce)."""
    d1 = dim + 1
    dist = (
        "CAST(list_sum(list_transform(range(1, {d1}), i -> "
        "(x.v[i] - c.v[i]) * (x.v[i] - c.v[i]))) AS BIGINT)"
    ).format(d1=d1)
    parts = [
        f"""xq AS MATERIALIZED (
        SELECT vec_id,
               list_transform(range(1, {d1}), i ->
                   CAST(floor(CAST(embedding[i] AS DOUBLE) * {q_scale}.0 + 0.5) AS BIGINT)) AS v
        FROM embeddings
    )""",
        f"c0 AS MATERIALIZED (SELECT vec_id AS c, v FROM xq WHERE vec_id < {k})",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""a{r} AS MATERIALIZED (
        SELECT vec_id, c AS cl FROM (
            SELECT x.vec_id, c.c,
                   row_number() OVER (PARTITION BY x.vec_id
                                      ORDER BY {dist} ASC, c.c ASC) AS rn
            FROM xq x CROSS JOIN c{r - 1} c
        ) WHERE rn = 1
    )"""
        )
        parts.append(
            f"""g{r} AS (
        SELECT a.cl, list(cv ORDER BY i) AS v FROM (
            SELECT a.cl AS cl, t.i AS i,
                   CAST(CAST(sum(x.v[t.i]) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS cv
            FROM a{r} a JOIN xq x USING (vec_id), range(1, {d1}) t(i)
            GROUP BY a.cl, t.i
        ) a GROUP BY a.cl
    )"""
        )
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT p.c, coalesce(g.v, p.v) AS v "
            f"FROM c{r - 1} p LEFT JOIN g{r} g ON g.cl = p.c)"
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT vec_id, CAST(cl AS BIGINT) AS cluster, d AS dist_fp FROM (
        SELECT x.vec_id, c.c AS cl, {dist} AS d,
               row_number() OVER (PARTITION BY x.vec_id
                                  ORDER BY {dist} ASC, c.c ASC) AS rn
        FROM xq x CROSS JOIN c{rounds} c
    ) WHERE rn = 1
    ORDER BY vec_id
    """
    )


@query("q_kmeans_portable", oracle=_kmeans_portable_oracle(8, 3))
def q_kmeans_portable(spark, sf_dir):
    """Distributed Lloyd's k-means in exact integer arithmetic
    (ext/kmeans.kmeans_portable_assign, k=8, 3 rounds) — the portable
    proof for the CLUSTERING-TRAINING class, the one family the twin
    program hadn't reached: IVF/PQ/SemDeDup portable variants pin their
    CODEBOOKS to stored seed rows precisely because float k-means can't
    cross-check, and the engine-native trainers stay rows-only. Here the
    training itself is exact: quantized vectors, seed centroids = ids
    0..k-1, integer-L2 argmin assignment (smallest-id ties), truncating-
    division centroid means, emptied clusters keep their centroid — the
    oracle unrolls the identical rounds into MATERIALIZED CTEs and the
    full (assignment, distance) table compares bit-for-bit. Scale shape:
    the corpus never moves — per round one map-side literal-array
    assignment pass (k·d int literals in codegen, no UDF) + one
    k-row-output aggregate (map-side partial combine) + a bounded k×d
    driver collect, the IVF-codebook pattern. Crafted-blob recovery and
    numpy-mirror equality are pytest-pinned (tests/test_kmeans.py).
    Ref parity n/a (charter extension; reference has no vector
    surface)."""
    from mesin_spark.ext.kmeans import kmeans_portable_assign

    emb = T(spark, sf_dir, "embeddings")
    return kmeans_portable_assign(emb, k=8, rounds=3).orderBy("vec_id")


@query("q_pca_portable", oracle=_pca_portable_oracle(16))
def q_pca_portable(spark, sf_dir):
    """Dominant principal-component score per embedding in exact integer
    fixed-point arithmetic (ext/pca.pca_portable_pc1, 16 power-iteration
    rounds) — the portable proof for the PCA class, closing the last
    rows-only-by-arithmetic family: q_embed_pca's float eigh/projection
    can never hash identically cross-engine, but quantize → integer
    Gram → truncating-division power iteration → sign-canonicalize →
    integer projection is reproducible bit-for-bit from the same stored
    rows (the oracle unrolls the identical rounds into MATERIALIZED
    CTEs). Cross-engine equality needs NO convergence assumption — both
    engines run the same fixed rounds — and the pytest pins what the
    direction means: exact PC1 tie (cosine ≥ 0.999) on a crafted corpus
    with a real spectral gap, and Rayleigh quotient ≥ 0.9·λ1 on this
    fixture, whose top eigenvalues are near-degenerate (λ2/λ1 = 0.93;
    measured variance capture at 16 rounds: 0.949/0.979/0.957 at
    sf 0.001/0.01/0.1 — any direction in that top eigenspace is
    equivalent for variance purposes, and singling out PC1 among
    near-equal eigenvalues is not a property worth hundreds of rounds).
    Scale shape: one bounded Arrow-batched Gram collect (one partial
    row per partition, integer sums are order-independent by
    construction), d×d iteration on the driver, literal-int codegen
    projection — no UDF, no shuffle on the way out. Ref parity n/a
    (charter extension; reference has no vector surface)."""
    from mesin_spark.ext.pca import pca_portable_pc1

    emb = T(spark, sf_dir, "embeddings")
    return pca_portable_pc1(emb, rounds=16).orderBy("vec_id")


@query(
    "q_random_projection",
    oracle=f"""
    SELECT vec_id,
           array_to_string(list_transform(range(0, 8), j ->
               printf('%.4f',
                   floor(list_sum(list_transform(range(1, 65), i ->
                       CAST(embedding[i] AS DOUBLE) *
                       (CASE WHEN ((((i - 1) * {_KNUTH} + j * {_PRIME2}) % 4294967296) >> 16) % 2 = 0
                             THEN 1.0 ELSE -1.0 END)
                   )) * 10000.0 + 0.5) / 10000.0)
           ), ',') AS proj
    FROM embeddings
    """,
)
def q_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss random projection 64 → 8 dims with ±1 signs
    derived from a portable 2-D hash (high bit of a Knuth mix — the low
    bit of a product of odd constants is a degenerate checkerboard), so
    both engines materialize the identical projection with no RNG state.
    Map-side only: one fold per output dim, summed in index order — the
    dimensionality-reduction front-end for cheap ANN / clustering at
    100 TB."""
    emb = F.col("embedding")

    def sign(i, j):
        mix = F.pmod((i - 1) * F.lit(_KNUTH) + j * F.lit(_PRIME2), F.lit(1 << 32))
        bit = F.pmod(F.shiftright(mix.cast("long"), 16), F.lit(2))
        return F.when(bit == 0, F.lit(1.0)).otherwise(F.lit(-1.0))

    # emitted as a fixed-format CSV string ('%.4f' per dim) rather than a
    # raw array<double>: the driver's pandas canonicalizer can't lexsort
    # an unhashable list column, and fixed-decimal formatting sidesteps
    # engine-specific double→string rendering
    proj = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda j: F.format_string(
                "%.4f",
                R(
                    F.aggregate(
                        F.sequence(F.lit(1), F.size(emb)),
                        F.lit(0.0),
                        lambda acc, i: acc
                        + F.element_at(emb, i).cast("double") * sign(i, j),
                    ),
                    4,
                ),
            ),
        ),
        ",",
    )
    return T(spark, sf_dir, "embeddings").select("vec_id", proj.alias("proj"))


@query(
    "q_shuffle_shards",
    oracle="""
    WITH h AS (
        SELECT doc_id, CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS hkey
        FROM documents
    )
    SELECT doc_id, CAST(hkey % 8 AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY hkey % 8
                                   ORDER BY hkey ASC, doc_id ASC) AS BIGINT) AS pos
    FROM h
    """,
)
def q_shuffle_shards(spark, sf_dir):
    """Deterministic global training shuffle: pseudorandom shard + dense
    in-shard position from a portable Knuth id-mix (ext.pipeline.
    shuffle_shards). The training reader consumes shards in pos order and
    sees a uniform corpus shuffle with NO global sort — one window
    shuffle on the shard key, shards numbered independently."""
    from mesin_spark.ext.pipeline import shuffle_shards

    d = T(spark, sf_dir, "documents").select("doc_id")
    return shuffle_shards(d, "doc_id", n_shards=8)


_QUALITY_SQL = """floor((0.4 * least(len(tk) / 100.0, 1.0)
             + 0.3 * (1.0 - CASE WHEN len(tk) > 0
                 THEN len(list_filter(tk, x -> x IN ('the','a','an','and','or','of','to','in','is','it')))::DOUBLE / len(tk)
                 ELSE 0.0 END)
             + 0.3 * least((CASE WHEN len(tk) > 0
                 THEN list_sum(list_transform(tk, x -> len(x)))::DOUBLE / len(tk)
                 ELSE 0.0 END) / 8.0, 1.0)) * 1000000.0 + 0.5) / 1000000.0"""


@query(
    "q_dedup_suppress",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk
        FROM documents
    ),
    base AS (SELECT doc_id, source, tk FROM t WHERE len(tk) >= 2),
    toks AS (
        SELECT doc_id, source,
               list_distinct(list_transform(
                   range(1, greatest(len(tk) - 1, 1) + 1),
                   i -> tk[i] || ' ' || tk[i + 1]
               )) AS g
        FROM base
    ),
    q AS (SELECT doc_id, {_QUALITY_SQL} AS quality FROM base),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM toks a JOIN toks b ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE floor((len(list_intersect(a.g, b.g))::DOUBLE
              / len(list_distinct(list_concat(a.g, b.g)))) * 1000000.0 + 0.5)
              / 1000000.0 >= 0.2
    ),
    losers AS (
        SELECT DISTINCT CASE WHEN qa.quality < qb.quality THEN p.id_a
                             WHEN qb.quality < qa.quality THEN p.id_b
                             ELSE greatest(p.id_a, p.id_b) END AS doc_id
        FROM pairs p
        JOIN q qa ON qa.doc_id = p.id_a
        JOIN q qb ON qb.doc_id = p.id_b
    )
    SELECT q.doc_id, q.quality
    FROM q
    WHERE q.doc_id NOT IN (SELECT doc_id FROM losers)
    """,
)
def q_dedup_suppress(spark, sf_dir):
    """Quality-aware dedup canonicalization: n-gram Jaccard near-dup pairs
    (the q_dedup_ngram candidate generator), then drop the LOWER-quality
    endpoint of every pair (ext.dedup.suppress_lower_quality) — the keep-
    best-copy selection real cleanup pipelines run, vs min-id clustering's
    arbitrary survivor. Fully oracle-checked: pair generation, the quality
    formula, and the suppression rule are all exact closed forms."""
    from mesin_spark.ext import dedup as D
    from mesin_spark.ext import text as TX

    docs = (
        T(spark, sf_dir, "documents")
        .filter(TX.token_count("text") >= 2)
        .select("doc_id", "source", "text")
    )
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", block_col="source", n=2,
                                  threshold=0.2)
    scored = docs.select("doc_id", TX.quality_score("text").alias("quality"))
    return D.suppress_lower_quality(scored, pairs, "doc_id", "quality")


@query(
    "q_cluster_components",
    oracle="""
    WITH RECURSIVE corpus AS (
        SELECT doc_id, source, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000000000, source, text FROM documents
    ),
    toks AS (
        SELECT doc_id, source,
               list_distinct(list_transform(
                   range(1, greatest(len(tk) - 1, 1) + 1),
                   i -> tk[i] || ' ' || tk[i + 1]
               )) AS g
        FROM (
            SELECT doc_id, source,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> len(t) > 0) AS tk
            FROM corpus
        )
        WHERE len(tk) >= 2
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM toks a JOIN toks b ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE floor((len(list_intersect(a.g, b.g))::DOUBLE
              / len(list_distinct(list_concat(a.g, b.g)))) * 1000000.0 + 0.5)
              / 1000000.0 >= 0.1
    ),
    nodes AS (
        SELECT DISTINCT id FROM (
            SELECT id_a AS id FROM pairs UNION SELECT id_b AS id FROM pairs
        )
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b AS a, id_a AS b FROM pairs
    ),
    reach AS (
        SELECT id, id AS r FROM nodes
        UNION
        SELECT e.b AS id, reach.r FROM reach JOIN edges e ON e.a = reach.id
    )
    SELECT id AS node, min(r) AS canonical_id FROM reach GROUP BY id
    """,
)
def q_cluster_components(spark, sf_dir):
    """Connected components over an EXACT near-dup pair set (word-2-gram
    Jaccard >= 0.1 on the planted-duplicate corpus), so the full iterative
    clustering path is oracle-checked end to end: the DuckDB oracle
    computes the same components by recursive-CTE transitive closure,
    while the Spark side runs ext.dedup.dedup_clusters' checkpointed
    min-label propagation with pointer jumping (O(log diameter) rounds).
    q_dedup_clusters stays the MinHash-fed production composition (rows-
    only by nature of engine-native sketches); this query certifies the
    component algorithm itself against an independent implementation."""
    from mesin_spark.ext import dedup as D
    from mesin_spark.ext import text as TX

    d = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    dup = d.union(d.withColumn("doc_id", F.col("doc_id") + 1000000000000)).filter(
        TX.token_count("text") >= 2
    )
    pairs = D.ngram_jaccard_pairs(dup, "doc_id", block_col="source", n=2,
                                  threshold=0.1)
    return D.dedup_clusters(pairs).orderBy("node")


# ----------------------------------------------------- trained quality tier


def _logreg_portable_oracle(
    epochs: int = 3,
    label_sql: str = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END",
) -> str:
    """Unrolled-epoch DuckDB mirror of ext/classifier's fixed-point
    logistic trainer (the kmeans/pca CTE pattern): integer features in
    Q units, hard-sigmoid link with truncating division (DuckDB ``//``
    == Spark ``div``), per-term-divided integer gradient sums
    (order-independent), integer mean step. The final per-doc
    (p_fp, pred, y) table compares bit-for-bit."""
    from mesin_spark.ext.classifier import Q_FP, _HALF, _LEN_SAT
    from mesin_spark.ext.text import STOPWORDS

    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    parts = [
        f"""xf AS MATERIALIZED (
        SELECT doc_id, CAST({label_sql} AS BIGINT) AS y,
               CAST({Q_FP} AS BIGINT) AS x0,
               least(CAST(tok AS BIGINT) * {Q_FP} // {_LEN_SAT}, {Q_FP}) AS x1,
               (CAST(stop AS BIGINT) * {Q_FP}) // greatest(CAST(tok AS BIGINT), 1) AS x2
        FROM (
            SELECT doc_id, lang, len(tk) AS tok,
                   len(list_filter(tk, t -> t IN ({stops}))) AS stop
            FROM (SELECT doc_id, lang,
                         list_filter(string_split_regex(lower(text), '\\s+'),
                                     t -> len(t) > 0) AS tk
                  FROM documents)
        )
    )""",
        "w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1, "
        "CAST(0 AS BIGINT) AS w2)",
    ]
    z = f"(x.x0 * w.w0 + x.x1 * w.w1 + x.x2 * w.w2) // {Q_FP}"
    p = f"least(greatest(({z}) // 4 + {_HALF}, 0), {Q_FP})"
    for r in range(1, epochs + 1):
        parts.append(
            f"""p{r} AS (SELECT x.doc_id, x.y, x.x0, x.x1, x.x2, {p} AS p
        FROM xf x CROSS JOIN w{r - 1} w)"""
        )
        parts.append(
            f"""g{r} AS (SELECT count(*) AS n,
        CAST(sum(((p - {Q_FP} * y) * x0) // {Q_FP}) AS BIGINT) AS g0,
        CAST(sum(((p - {Q_FP} * y) * x1) // {Q_FP}) AS BIGINT) AS g1,
        CAST(sum(((p - {Q_FP} * y) * x2) // {Q_FP}) AS BIGINT) AS g2
        FROM p{r})"""
        )
        parts.append(
            f"""w{r} AS (SELECT w.w0 - g.g0 // g.n AS w0,
        w.w1 - g.g1 // g.n AS w1, w.w2 - g.g2 // g.n AS w2
        FROM w{r - 1} w CROSS JOIN g{r} g)"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT x.doc_id, CAST({p} AS BIGINT) AS p_fp,
           CAST(CASE WHEN {p} >= {_HALF} THEN 1 ELSE 0 END AS BIGINT) AS pred,
           CAST(x.y AS BIGINT) AS y
    FROM xf x CROSS JOIN w{epochs} w
    ORDER BY doc_id
    """
    )


_LM_LABEL = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END"


@query("q_lm_classifier_portable", oracle=_logreg_portable_oracle(3, _LM_LABEL))
def q_lm_classifier_portable(spark, sf_dir):
    """Fixed-point logistic-regression quality classifier TRAINED
    IN-ENGINE (ext/classifier.logreg_portable_train, 3 epochs) — the
    model-based curation tier's cross-engine proof, extending the
    kmeans/pca portable-training program to supervised learning:
    integer features in Q units (bias / saturating length / stopword
    ratio), hard-sigmoid link via truncating division, per-term-divided
    integer gradient sums (order-independent under any partitioning),
    integer mean step from zero weights. Label: lang = 'en' (the
    English-stopword feature genuinely separates it — trained accuracy
    is pytest-pinned, and a pure-Python mirror reproduces the weights
    merge-for-merge). Scale shape: per epoch ONE corpus scan + one
    single-row aggregate (map-side partial combine); weights bake into
    the next epoch's codegen'd plan as literals — no join, no UDF, no
    data shuffle. The oracle unrolls the identical epochs into CTEs and
    the per-doc (p_fp, pred, y) table compares bit-for-bit. Ref parity
    n/a (charter extension; reference has no ML surface)."""
    from mesin_spark.ext import classifier as C

    d = T(spark, sf_dir, "documents")
    xf = C.portable_feature_frame(d, _LM_LABEL)
    w = C.logreg_portable_train(xf, epochs=3)
    return C.logreg_portable_score_frame(xf, w).orderBy("doc_id")


@query("q_lm_classifier")
def q_lm_classifier(spark, sf_dir):
    """Float logistic-regression quality scorer trained in-engine
    (ext/classifier.logreg_train, sigmoid link, 8 epochs, one
    single-row gradient aggregate per epoch) scoring every doc —
    rows-only BY ARITHMETIC (float exp/division can't hash identically
    cross-engine; the sibling q_lm_classifier_portable carries the
    exact-oracle proof, and held-out AUC on separable data is
    pytest-asserted in tests/test_classifier.py). Output: (doc_id,
    score, pred) with score at 6dp."""
    from mesin_spark.ext import classifier as C

    d = T(spark, sf_dir, "documents")
    w = C.logreg_train(
        d, F.expr(_LM_LABEL), epochs=8, lr=1.0
    )
    score = C.logreg_score(w)
    return d.select(
        "doc_id",
        R(score, 6).alias("score"),
        F.when(score >= 0.5, F.lit(1)).otherwise(F.lit(0)).alias("pred"),
    ).orderBy("doc_id")


@query(
    "q_token_budget_learned",
    oracle="WITH "
    + _logreg_portable_oracle(3, _LM_LABEL)
    .split("WITH ", 1)[1]
    .rsplit("SELECT x.doc_id", 1)[0]
    + """, scored AS (
        SELECT x.doc_id,
               CAST(least(greatest(((x.x0 * w.w0 + x.x1 * w.w1 + x.x2 * w.w2)
                   // 1000000) // 4 + 500000, 0), 1000000) AS DOUBLE)
                   / 1000000.0 AS q,
               tok.nt AS nt
        FROM xf x CROSS JOIN w3 w
        JOIN (SELECT doc_id,
                     len(list_filter(string_split_regex(lower(text), '\\s+'),
                                     t -> len(t) > 0)) AS nt
              FROM documents) tok USING (doc_id)
    ), bins AS (
        SELECT floor(q * 1000000.0 + 0.5) / 1000000.0 AS qbin,
               sum(nt) AS toks, count(*) AS docs
        FROM scored GROUP BY 1
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
def q_token_budget_learned(spark, sf_dir):
    """Token-budget thresholding on the LEARNED quality score — the
    composition the trained tier exists for (DCLM: train a scorer, keep
    the top-scored token budget): the fixed-point classifier's
    hard-sigmoid probability (exact integers, q_lm_classifier_portable's
    weights) becomes token_budget_threshold's quality column via its
    ``quality_col`` hook, and the half-budget cut stays EXACT-oracle —
    training unroll, scoring, binning, and budget window all replayed in
    one DuckDB statement. Same 100 TB shape as q_token_budget: bounded
    bin table (p_fp has ≤Q+1 values), corpus-size-independent window."""
    from mesin_spark.ext import classifier as C
    from mesin_spark.ext import pipeline as P

    d = T(spark, sf_dir, "documents")
    xf = C.portable_feature_frame(d, _LM_LABEL)
    w = C.logreg_portable_train(xf, epochs=3)
    scored = d.join(
        C.logreg_portable_score_frame(xf, w).select("doc_id", "p_fp"),
        "doc_id",
    )
    return P.token_budget_threshold(
        scored,
        budget_frac=0.5,
        quality_col=F.col("p_fp").cast("double") / F.lit(1000000.0),
    )
