"""Training-data pipeline utilities (charter tier, SURVEY.md §2.11):
deterministic train/val splitting, PII scrubbing, and document chunking.

Everything is a pure map-side projection — no shuffle, linear in corpus
size, trivially parallel at 100 TB. The split hash is engine-portable
arithmetic (Knuth multiplicative mix, exact int64) rather than an
engine-native hash, so the assignment is reproducible anywhere and
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mesin_spark.ext.text import token_count, tokens
from mesin_spark.functions import stable_round as R

#: Knuth's multiplicative constant (2^32 / phi); mixing mod 2^32.
_KNUTH = 2654435761
_MOD32 = 1 << 32

#: Redaction patterns — conservative, RE2/Java-regex compatible.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"


def split_bucket(
    id_col: Column | str, n_buckets: int = 10000, salt: int = 0
) -> Column:
    """Deterministic bucket in [0, n_buckets) from an integer id:
    ((id + salt) * 2654435761) mod 2^32 mod n_buckets. Portable exact-int
    arithmetic — identical in any engine, unlike xxhash/murmur.
    Overflow-safe for any int64 id (functions.mul_mod32): the naive
    product errors under ANSI once id exceeds ~3.5e9.

    SHARED-HASH CONTRACT: at salt=0 every sampling/splitting utility
    reads the same bucket. That is deliberate where composition must be
    exact (bernoulli fractions nest; bernoulli pre-thinning preserves
    grouped_sample's ranks) but CORRELATES independent decisions: a
    bernoulli_sample(0.1) survivor set fed to hash_split(0.9) yields an
    EMPTY val split (every survivor's bucket < 1000 < 9000). Pass
    distinct ``salt`` values to decisions that must be independent."""
    from mesin_spark.functions import mul_mod32

    c = F.col(id_col) if isinstance(id_col, str) else id_col
    if salt:
        c = c + F.lit(salt)
    return F.pmod(mul_mod32(c, _KNUTH), F.lit(n_buckets))


def hash_split(
    df: DataFrame,
    id_col: str,
    frac_train: float = 0.9,
    n_buckets: int = 10000,
    salt: int = 0,
) -> DataFrame:
    """Adds a 'split' column ('train' / 'val') by deterministic id bucket.
    Stable across runs, engines, and re-partitioning — the property random
    sampling lacks; new rows never flip old rows' assignment. When the
    input was itself selected by a salt-0 bucket filter (bernoulli/
    stratified), pass a nonzero ``salt`` or the split correlates with the
    selection (see split_bucket)."""
    cut = int(round(frac_train * n_buckets))
    return df.withColumn(
        "split",
        F.when(split_bucket(id_col, n_buckets, salt) < cut, F.lit("train")).otherwise(
            F.lit("val")
        ),
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    frac_train: float = 0.9,
    n_buckets: int = 10000,
    salt: int = 0,
) -> DataFrame:
    """Duplicate-cluster-aware train/val split: every document in a
    duplicate cluster gets the SAME split, so a val document can never
    have a train-side verbatim copy — the eval-leakage failure plain
    hash_split has (a doc and its clone hash to DIFFERENT ids, land on
    opposite sides of the cut, and the benchmark silently scores
    memorization; the canonical motivation in Lee et al. 2021,
    'Deduplicating Training Data Makes Language Models Better').

    Returns (id, cluster_id, split): cluster_id = min id over identical
    text, split = hash_split's portable bucket ON THE CLUSTER id (same
    Knuth-mix arithmetic, so singleton clusters split exactly like
    hash_split would).

    Scale shape: ONE window shuffle keyed by the portable text
    fingerprint (a compact long — the raw text never becomes a shuffle
    key), then a map-side bucket CASE. Clustering is by fingerprint
    equality: fp collisions (~n²/2e9 pairs) can only MERGE clusters,
    which is leakage-SAFE (two unrelated docs forced to one side) at a
    negligible stratification cost. For NEAR-dup leakage, feed
    dedup_clusters' component map through the same cluster-id bucket
    instead — this function is the exact-duplicate tier of that
    composition."""
    from mesin_spark.ext.text import fingerprint

    d = df.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("_fp")
    )
    w = Window.partitionBy("_fp")
    cut = int(round(frac_train * n_buckets))
    return (
        d.withColumn("cluster_id", F.min(id_col).over(w))
        .withColumn(
            "split",
            F.when(
                split_bucket("cluster_id", n_buckets, salt) < cut,
                F.lit("train"),
            ).otherwise(F.lit("val")),
        )
        .select(id_col, "cluster_id", "split")
    )


def soft_dedup_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Soft deduplication: instead of DROPPING duplicates (exact_dedup)
    or suppressing the worse copy (suppress_lower_quality), keep every
    row and emit a training sample weight 1/n_copies, so a document
    duplicated m times contributes the same total gradient mass as a
    unique one (the reweight-don't-delete strategy — public SoftDeDup
    line of work; useful when duplicates carry distinct metadata the
    pipeline must keep). Returns (id, cluster_id, n_copies, weight).

    Same cluster machinery as leakage_safe_split: one window shuffle
    keyed by the portable text fingerprint (compact long key, never the
    raw text); fingerprint collisions can only merge clusters, which
    UNDER-weights the merged docs — conservative for training. Weight
    is 6-dp stable-rounded so the value is engine-portable."""
    from mesin_spark.ext.text import fingerprint
    from mesin_spark.functions import stable_round as R

    d = df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("_fp"))
    w = Window.partitionBy("_fp")
    return d.select(
        F.col(id_col),
        F.min(id_col).over(w).alias("cluster_id"),
        F.count(F.lit(1)).over(w).alias("n_copies"),
        R(F.lit(1.0) / F.count(F.lit(1)).over(w), 6).alias("weight"),
    )


def source_overlap(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Cross-source duplicate-contamination matrix: for every pair of
    sources, how many DISTINCT texts appear in both, and what share of
    each source's distinct texts that overlap is. The dataset-curation
    diagnostic behind 'is domain B just a mirror of domain A' and
    'did the eval split's source leak into a training source' —
    computed corpus-wide with NO document pair space: texts fold to the
    portable fingerprint, (source, fp) pairs dedupe, and the self-join
    key is the fingerprint, whose per-key match count is bounded by the
    SOURCE cardinality (a handful), never by corpus size. Returns
    (source_a, source_b, n_shared, share_of_a, share_of_b),
    source_a < source_b, 6-dp stable-rounded shares."""
    from mesin_spark.ext.text import fingerprint
    from mesin_spark.functions import stable_round as R

    sf = df.select(
        F.col(source_col).alias("_src"), fingerprint(F.col(text_col)).alias("_fp")
    ).distinct()
    counts = sf.groupBy("_src").agg(F.count(F.lit(1)).alias("_n"))
    a = sf.select(F.col("_src").alias("source_a"), "_fp")
    b = sf.select(F.col("_src").alias("source_b"), "_fp")
    shared = (
        a.join(b, "_fp")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ca = counts.select(F.col("_src").alias("source_a"), F.col("_n").alias("_na"))
    cb = counts.select(F.col("_src").alias("source_b"), F.col("_n").alias("_nb"))
    return (
        shared.join(F.broadcast(ca), "source_a")
        .join(F.broadcast(cb), "source_b")
        .select(
            "source_a", "source_b", "n_shared",
            R(F.col("n_shared") / F.col("_na"), 6).alias("share_of_a"),
            R(F.col("n_shared") / F.col("_nb"), 6).alias("share_of_b"),
        )
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
    n_buckets: int = 10000,
) -> DataFrame:
    """Deterministic stratified sampling: keep a per-stratum fraction of
    rows, selected by portable id-hash bucket — the corpus-mixing /
    rebalancing primitive (e.g. keep 100% of books, 10% of web crawl).
    Unlike df.sampleBy this is reproducible across runs, engines, and
    repartitioning, and never flips a row's fate when data is appended.
    Map-side only: a single CASE-filter, no shuffle."""
    bucket = split_bucket(id_col, n_buckets)
    cut = None
    for value, frac in fractions.items():
        branch = F.when(F.col(strata_col) == value, F.lit(int(round(frac * n_buckets))))
        cut = branch if cut is None else cut.when(
            F.col(strata_col) == value, F.lit(int(round(frac * n_buckets)))
        )
    cut = (
        cut.otherwise(F.lit(int(round(default_fraction * n_buckets))))
        if cut is not None
        else F.lit(int(round(default_fraction * n_buckets)))
    )
    return df.filter(bucket < cut)


def bernoulli_sample(
    df: DataFrame, id_col: str, fraction: float, n_buckets: int = 10000
) -> DataFrame:
    """Deterministic TABLESAMPLE BERNOULLI: keep a row iff its portable
    id-hash bucket falls under ``fraction`` — reproducible across runs,
    engines, and repartitioning (df.sample is none of those). Map-side
    filter, no shuffle; composes with any downstream plan and the filter
    reaches the parquet scan when id_col is a stored column."""
    # round, not int(): binary-float error makes int() undercut 573 of
    # the 10000 exact 4-decimal fractions (e.g. 0.0003*10000 -> 2)
    return df.filter(
        split_bucket(id_col, n_buckets) < int(round(fraction * n_buckets))
    )


def grouped_sample(
    df: DataFrame, strata_col: str, id_col: str, n_per_group: int
) -> DataFrame:
    """Deterministic fixed-size per-stratum sample (the reservoir-sampling
    use case, but reproducible): rank rows within each stratum by portable
    id-hash (id tie-break) and keep the first ``n_per_group``. Appending
    data only ever displaces rows at the tail of the hash order — far more
    stable than a true reservoir. Adds 'rn' (1-based rank within stratum).

    Scale note: one shuffle on the stratum key; each stratum is ranked by a
    single reducer, so this is for cardinality-bounded strata (sources,
    languages, shards). For huge strata, pre-thin with bernoulli_sample at
    a fraction safely above n_per_group/|stratum| first — determinism makes
    the composition exact."""
    from mesin_spark.functions import mul_mod32

    order_hash = F.pmod(mul_mod32(F.col(id_col), _KNUTH), F.lit(_MOD32))
    w = Window.partitionBy(strata_col).orderBy(order_hash.asc(), F.col(id_col).asc())
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_per_group)
    )


def negative_sample(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    k: int | None = None,
    oversample: int = 4,
    items: DataFrame | None = None,
) -> DataFrame:
    """Negative sampling for contrastive / recommendation training: per
    user, items they have NEVER interacted with.

    ``k=None`` → EXACT enumeration: every non-interacted catalog item per
    user (catalog broadcast-expanded, one anti-join). Correct — and only
    sane — when the catalog is small (the fixture's 20-item case).

    ``k`` set → CAPPED sampling, the shape a real 10⁶-item catalog needs:
    the candidate set is bounded to ``k * oversample`` portable-hash draws
    per user BEFORE the anti-join, so candidate rows — never users×items —
    bound every shuffle. Each user draws ``k*oversample`` slot hashes
    (``xxhash64(user, slot) mod |catalog|``), joins them to the indexed
    catalog, drops positives with the anti-join, and keeps the first ``k``
    distinct negatives by per-user hash rank. Deterministic: same inputs →
    same negatives, across runs and repartitioning. Oversampling absorbs
    hash collisions and positive hits; users whose draw count can't reach
    ``k`` distinct negatives return fewer (never wrong) rows.

    Scale audit: catalog indexing is one catalog-sized window (row_number
    over a single ordered partition — catalog metadata scale, not corpus
    scale); the candidate frame is exactly users × k × oversample rows
    through the item join, the anti-join, and the dedup/rank shuffle.
    """
    pos = interactions.select(user_col, item_col).distinct()
    catalog = (items or pos.select(item_col)).select(item_col).distinct()
    users = pos.select(user_col).distinct()
    if k is None:
        return (
            users.crossJoin(F.broadcast(catalog))
            .join(pos, [user_col, item_col], "left_anti")
        )
    n_items = catalog.count()
    if n_items == 0:
        return users.limit(0).crossJoin(catalog)
    idx_w = Window.orderBy(F.col(item_col).asc())
    indexed = catalog.withColumn("_idx", F.row_number().over(idx_w) - 1)
    n_slots = max(k, k * oversample)
    cand = (
        users.select(
            user_col, F.explode(F.sequence(F.lit(0), F.lit(n_slots - 1))).alias("_slot")
        )
        .withColumn(
            "_idx",
            F.pmod(F.xxhash64(F.col(user_col), F.col("_slot")), F.lit(n_items)),
        )
        .join(indexed, "_idx")
        .select(user_col, item_col)
        .dropDuplicates([user_col, item_col])
        .join(pos, [user_col, item_col], "left_anti")
    )
    rank_w = Window.partitionBy(user_col).orderBy(
        F.xxhash64(F.col(user_col), F.col(item_col)).asc(), F.col(item_col).asc()
    )
    return (
        cand.withColumn("_rn", F.row_number().over(rank_w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def scrub_text(col: Column | str) -> Column:
    """Redact emails and phone-number-ish digit runs ([EMAIL], [PHONE]) —
    regexp_replace replaces every occurrence, map-side only."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.regexp_replace(c, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]")


def pack_sequences(
    chunks: DataFrame,
    id_col: str = "doc_id",
    order_col: str = "chunk_id",
    tok_col: str = "n_tokens",
    capacity: int = 512,
    n_shards: int = 16,
) -> DataFrame:
    """Sequence packing (concatenate-and-chunk): lay the chunks of a corpus
    end-to-end in deterministic order and cut the stream into fixed-capacity
    training sequences. Each chunk gets (shard, bin_id, bin_offset): the
    training sequence it starts in and its token offset there — a chunk may
    straddle a bin boundary, exactly like the standard concat-then-chunk
    packing used to build pre-training batches (no padding waste).

    Parallel at scale: packing order is per-shard (deterministic hash bucket
    of the doc id), so the running-sum window is ``n_shards``-way parallel
    and each shard's bins are independent — raise n_shards with the cluster.
    One shuffle (the window partition)."""
    shard = split_bucket(F.col(id_col), n_shards)
    w = Window.partitionBy("shard").orderBy(F.col(id_col), F.col(order_col))
    start = F.sum(F.col(tok_col)).over(w) - F.col(tok_col)
    return (
        chunks.withColumn("shard", shard)
        .withColumn("bin_id", F.floor(start / capacity))
        .withColumn("bin_offset", (start % capacity).cast("long"))
    )


def domain_mixture(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    target: dict[str, float] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-domain corpus statistics + resampling weights toward a target
    mixture: (domain, n_docs, n_tokens, token_share, mix_weight) where
    mix_weight = target_share / token_share — the factor to up/down-sample
    each domain so the token mixture matches ``target`` (uniform across
    observed domains when None). Two tiny shuffles: one partial-agg groupBy
    on the domain key, then a global window over the #domains-row result —
    nothing here grows with corpus size except the first scan."""
    stats = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col)).alias("n_tokens"),
    )
    w = Window.partitionBy()
    share = F.col("n_tokens") / F.sum("n_tokens").over(w)
    if target is None:
        target_share = F.lit(1.0) / F.count(F.lit(1)).over(w)
    else:
        expr = None
        for dom, t in target.items():
            branch = F.when(F.col("domain") == dom, F.lit(float(t)))
            expr = branch if expr is None else expr.when(F.col("domain") == dom, F.lit(float(t)))
        target_share = expr.otherwise(F.lit(0.0))
    return stats.select(
        "domain",
        "n_docs",
        "n_tokens",
        R(share, round_to).alias("token_share"),
        R(target_share / share, round_to).alias("mix_weight"),
    )


def domain_mixture_temperature(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    temperature: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Temperature-smoothed domain sampling (the multilingual/GLaM
    mixing rule): sampling share ∝ token_share^T, T<1 up-weighting rare
    domains without the uniform target's full flattening. Returns
    (domain, n_docs, n_tokens, token_share, sample_fp, mix_weight) where
    sample_fp is the smoothed sampling share in parts-per-1e6 and
    mix_weight = sampled_share / token_share feeds apply_mixture.

    Portability discipline: at the DEFAULT T=0.5 every step is
    bit-reproducible cross-engine with no summation-order hazard —
    share = n_tokens/total is one correctly-rounded division of exact
    int64 doubles, sqrt is IEEE-754 correctly rounded (the reason 0.5
    is the pinned registry temperature — pow(x, T) for general T is
    libm-dependent and can differ by ULPs between engines), the smoothed
    weight is then FIXED-POINTED (floor(·1e6 + 0.5)) so the
    normalization sum runs in exact integers, and the final shares use
    truncating integer division (Spark `div` == DuckDB `//`). General T
    is supported via pow with the documented cross-engine caveat.
    Exact for corpora up to 2^53 tokens (the int64→double exactness
    bound); the shuffles are one partial-agg groupBy + windows over the
    #domains-row result — nothing grows with the corpus but the scan."""
    stats = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col)).alias("n_tokens"),
    )
    w = Window.partitionBy()
    smoothed = (
        F.sqrt(F.col("_share"))
        if temperature == 0.5
        else F.pow(F.col("_share"), F.lit(float(temperature)))
    )
    staged = (
        stats.withColumn("_tot", F.sum("n_tokens").over(w))
        # zero-token guards (mirroring domain_mixture's otherwise(0.0)
        # branch): an all-empty corpus makes _tot=0 (0/0 = NaN share),
        # and a single empty domain makes _share=0 — both must surface
        # as 0-weight rows, not NaN/NULL
        .withColumn(
            "_share",
            F.when(
                F.col("_tot") > 0,
                F.col("n_tokens").cast("double") / F.col("_tot").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "_wfp",
            F.floor(smoothed * F.lit(1_000_000.0) + F.lit(0.5)).cast("long"),
        )
        .withColumn("_wsum", F.sum("_wfp").over(w))
        .withColumn(
            "sample_fp",
            F.when(
                F.col("_wsum") > 0, F.expr("(_wfp * 1000000) div _wsum")
            ).otherwise(F.lit(0)),
        )
    )
    return staged.select(
        "domain",
        "n_docs",
        "n_tokens",
        R(F.col("_share"), round_to).alias("token_share"),
        F.col("sample_fp").cast("bigint").alias("sample_fp"),
        R(
            F.when(
                F.col("_share") > 0,
                (F.col("sample_fp") / F.lit(1_000_000.0)) / F.col("_share"),
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("mix_weight"),
    )


def apply_mixture(
    docs: DataFrame,
    weights: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    n_buckets: int = 10000,
) -> DataFrame:
    """Materialize a target mixture (the executor for domain_mixture's
    plan): every document keeps floor(w) copies plus one more iff its
    deterministic id bucket falls under frac(w) — downsampling (w<1) and
    upsampling (w>1) in one explode, reproducible across runs/engines/
    appends. ``weights`` is (domain, mix_weight), broadcast-sized (#domains
    rows). Output adds ``copy_no`` (1..n); dropped docs emit no rows.
    Map-side after the broadcast join — no corpus shuffle."""
    w = weights.select(
        F.col("domain").alias(domain_col), F.col("mix_weight").alias("_w")
    )
    joined = docs.join(F.broadcast(w), domain_col)
    frac = F.col("_w") - F.floor("_w")
    # the extra-copy coin uses its OWN salt: on the shared salt-0 hash,
    # rows already selected/split by bucket filters would win or lose the
    # extra copy in lockstep with that selection (e.g. no val-split doc
    # ever upsampled)
    n_copies = (
        F.floor("_w").cast("long")
        + F.when(split_bucket(id_col, n_buckets, salt=3) < frac * n_buckets, 1).otherwise(0)
    )
    copies = F.when(n_copies >= 1, F.sequence(F.lit(1).cast("long"), n_copies)).otherwise(
        F.array().cast("array<long>")
    )
    return (
        joined.withColumn("copy_no", F.explode(copies))
        .drop("_w")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into overlapping token windows — the standard
    pre-training chunker. Token windows of ``chunk_tokens`` starting every
    ``stride`` tokens (the final partial window is kept so no text drops).
    Explode is map-side; output rows carry (id, chunk_id, chunk_text,
    n_tokens). Token array let-bound (ext/text.let_bound): the window
    lambda previously captured the tokenize expression and re-ran it per
    chunk window — the O(tokens²/stride) class fixed across the text
    tier this round."""
    from mesin_spark.ext.text import let_bound

    def _windows(t):
        n = F.greatest(F.size(t), F.lit(0))  # size(NULL) is -1 with ANSI off
        starts = F.sequence(
            F.lit(0), F.greatest(F.ceil((n - chunk_tokens) / stride), F.lit(0))
        )
        return F.transform(
            starts,
            lambda i: F.struct(
                i.alias("chunk_id"),
                F.concat_ws(" ", F.slice(t, i * stride + 1, chunk_tokens)).alias(
                    "chunk_text"
                ),
                F.least(n - i * stride, F.lit(chunk_tokens)).alias("n_tokens"),
            ),
        )

    windows = let_bound(tokens(F.col(text_col)), _windows)
    return df.select(F.col(id_col), F.explode(windows).alias("c")).select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_tokens").alias("n_tokens"),
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic global training shuffle: every row gets a pseudorandom
    shard in [0, n_shards) and a dense position within its shard, both pure
    functions of the id (Knuth mix — portable exact-int arithmetic, so the
    order is reproducible in any engine and stable under re-runs).

    This is the corpus-order randomizer in front of sequence packing: a
    training job reads shard files in pos order and sees a uniform shuffle
    without any global sort. One hash-partition window shuffle on the
    shard key; each shard numbers independently (n_shards-way parallel) —
    no single-task global row_number bottleneck at 100 TB.

    Size ``n_shards`` so one shard's rows fit a single task's sort
    (corpus_rows / n_shards ≈ a few million): ~100k shards at 100 TB.
    The parameter is the parallelism knob — the default 8 matches the
    local testdata, not a deployment."""
    from mesin_spark.functions import mul_mod32

    hkey = F.pmod(mul_mod32(F.col(id_col), _KNUTH), F.lit(_MOD32))
    out = df.withColumn("_h", hkey).withColumn(
        "shard", F.pmod(F.col("_h"), F.lit(n_shards))
    )
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return out.withColumn("pos", F.row_number().over(w).cast("long")).drop("_h")


def token_budget_threshold(
    docs: DataFrame,
    budget_frac: float | None = None,
    budget_tokens: int | None = None,
    text_col: str = "text",
    round_to: int = 6,
    quality_col: Column | None = None,
) -> DataFrame:
    """Quality threshold for a token budget — the curation step that
    turns "train on the best N tokens" into a concrete filter:
    rank the corpus by quality_score and find the threshold that keeps
    (approximately, at quality-bin granularity) the budgeted token
    count, highest quality first (the FineWeb/DCLM-style keep-top-
    fraction-by-score recipe, Penedo et al. 2024).

    Exactly one of ``budget_frac`` (fraction of total corpus tokens) or
    ``budget_tokens`` (absolute) must be given. Returns ONE row:
    (threshold, kept_docs, kept_tokens, total_docs, total_tokens) —
    ``threshold`` is the minimum quality bin kept (NULL when the budget
    keeps nothing); the doc-level filter is then
    ``quality_score(text) >= threshold``. Whole bins keep or drop
    together, so kept_tokens may overshoot the budget by part of the
    boundary bin — deterministic, engine-independent semantics an
    oracle can replay, unlike a row-level cut that would depend on
    tie-order within a bin. Empty corpus → zero rows. A budget at or
    above the corpus total keeps EVERY bin — including zero-token bins
    (empty docs) that a strict before-under-budget cut would drop once
    the running sum reaches the exhausted budget.

    Scale shape — deliberately NOT a global sort + running sum over the
    corpus (a single-task window at 100 TB): quality rounds to
    ``round_to`` decimals, so the corpus aggregates to AT MOST
    10^round_to + 1 bins in one partial-combined groupBy whatever the
    corpus size; the cumulative-sum window then orders a BOUNDED bin
    table (single partition over ≤1e6 tiny rows — the same bounded
    single-partition window as a quantile table, not a corpus window).
    One corpus pass total; the bin table pins (PinnedCache) across its
    totals + window consumers."""
    if (budget_frac is None) == (budget_tokens is None):
        raise ValueError(
            "token_budget_threshold: give exactly one of budget_frac or "
            "budget_tokens"
        )
    if budget_frac is not None and not (0.0 <= budget_frac <= 1.0):
        raise ValueError(
            f"budget_frac must be in [0, 1] — got {budget_frac}"
        )
    from mesin_spark.ext.pin import PINNED
    from mesin_spark.ext.text import quality_score

    # quality_col: the model-based-curation hook — a TRAINED scorer
    # (ext/classifier.logreg_score, or the fixed-point twin's p_fp/Q)
    # replaces the heuristic quality_score; token counting still comes
    # from text_col, and the bin-granular budget semantics are unchanged
    q = quality_col if quality_col is not None else quality_score(F.col(text_col))
    bins = PINNED.pin(
        docs.select(
            R(q, round_to).alias("qbin"),
            token_count(F.col(text_col)).alias("_t"),
        )
        .groupBy("qbin")
        .agg(
            F.sum("_t").alias("_toks"),
            F.count(F.lit(1)).alias("_docs"),
        )
    )
    w = (
        Window.orderBy(F.desc("qbin"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = bins.withColumn(
        "_before", F.coalesce(F.sum("_toks").over(w), F.lit(0))
    ).crossJoin(
        F.broadcast(
            bins.agg(F.sum("_toks").alias("_tt"), F.sum("_docs").alias("_td"))
        )
    )
    budget = (
        F.lit(float(budget_frac)) * F.col("_tt")
        if budget_frac is not None
        else F.lit(int(budget_tokens))
    )
    # a bin keeps while tokens BEFORE it are under budget; the explicit
    # full-budget arm keeps zero-token bins (empty docs) whose _before
    # already EQUALS an exhausted budget — with budget >= total tokens
    # every doc is kept, including token-free ones (round-11 ADVICE:
    # budget_frac=1.0 must give kept_docs == total_docs)
    keep = (F.col("_before") < budget) | (F.col("_tt") <= budget)
    return cum.groupBy("_tt", "_td").agg(
        F.min(F.when(keep, F.col("qbin"))).alias("threshold"),
        F.coalesce(F.sum(F.when(keep, F.col("_docs"))), F.lit(0)).alias(
            "kept_docs"
        ),
        F.coalesce(F.sum(F.when(keep, F.col("_toks"))), F.lit(0)).alias(
            "kept_tokens"
        ),
    ).select(
        "threshold", "kept_docs", "kept_tokens",
        F.col("_td").alias("total_docs"),
        F.col("_tt").alias("total_tokens"),
    )
