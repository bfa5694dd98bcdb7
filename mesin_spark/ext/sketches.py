"""Count-Min sketch: fixed-size frequency estimation over an unbounded
token stream — the classic heavy-hitters sketch for 100 TB corpora where
an exact token count table no longer fits anywhere.

Build: every token increments d counters, one per hash row, at position
((fp · salt_j) mod 2^32) mod w — expressed as an explode + one hash-agg
shuffle on (row, pos), so the sketch materializes as a (d·w)-row table
regardless of corpus size (mergeable across shards/days by simple
addition: counters are sums).

Estimate: min over the d counters a token maps to; always ≥ the true
count (collisions only inflate). All hashes are portable exact-int
arithmetic (the polynomial fingerprint + Knuth-style mixes), so estimates
are bit-reproducible in any engine — the oracle recomputes them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mesin_spark.ext.text import FINGERPRINT_BASE, FINGERPRINT_MOD

#: Independent odd multipliers for the d sketch rows (same family as the
#: Bloom salts).
CMS_SALTS = (2654435761, 2246822519, 3266489917, 668265263)
_MOD32 = 1 << 32


def token_fingerprint(col: Column | str) -> Column:
    """Polynomial rolling hash of a (short) token string —
    h ← (h·131 + code) mod 1e9+7, the same portable arithmetic as
    text.fingerprint, applied per token."""
    c = F.col(col) if isinstance(col, str) else col
    codes = F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda h, code: (h * FINGERPRINT_BASE + code) % FINGERPRINT_MOD,
    )


def cms_position(fp: Column, row: int, w: int) -> Column:
    """Counter position of fingerprint ``fp`` in sketch row ``row``."""
    return F.pmod(F.pmod(fp * F.lit(CMS_SALTS[row]), F.lit(_MOD32)), F.lit(w))


def cms_build(
    toks: DataFrame, tok_col: str = "tok", w: int = 512, d: int = 4
) -> DataFrame:
    """Build the sketch from a token stream: returns (row, pos, cnt),
    ≤ d·w rows total. One explode (d rows per token) + one hash-agg
    shuffle with map-side partial counts."""
    fp = token_fingerprint(tok_col)
    cells = F.array(
        *[
            F.struct(F.lit(j).alias("row"), cms_position(fp, j, w).alias("pos"))
            for j in range(d)
        ]
    )
    return (
        toks.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, queries: DataFrame, tok_col: str = "tok", w: int = 512, d: int = 4
) -> DataFrame:
    """Estimated count per query token: min over its d counters. The
    sketch is ≤ d·w rows — broadcast — so estimation is d map-side joins
    folded into one via explode + groupBy-min keyed on the query token."""
    fp = token_fingerprint(tok_col)
    cells = F.array(
        *[
            F.struct(F.lit(j).alias("row"), cms_position(fp, j, w).alias("pos"))
            for j in range(d)
        ]
    )
    exploded = queries.select(F.col(tok_col), F.explode(cells).alias("c")).select(
        tok_col, F.col("c.row").alias("row"), F.col("c.pos").alias("pos")
    )
    joined = exploded.join(F.broadcast(sketch), ["row", "pos"], "left")
    return (
        joined.groupBy(tok_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_n"))
    )


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per group: keep the k
    SMALLEST portable-hash values of the key; the k-th smallest hash
    estimates distinct count as (k-1) / (h_k / 2^32) (Bar-Yossef et al.
    2002). Returns (group, kmv[array<long>], est_distinct).

    The sketch is MERGEABLE (union arrays, sort, keep k — re-aggregation
    never touches raw keys) and, because the hash is exact-int Knuth
    arithmetic rather than an engine-native hash, the estimate is
    bit-reproducible in any engine — the one property DataSketches/HLL
    blobs can't give an independent oracle.

    Shape: one hash-agg shuffle on (group, h) for DISTINCT hashes, then
    a per-group rank window over distinct hashes only. At 100 TB the
    window input is bounded by per-group DISTINCT cardinality; a native
    k-state UDAF would drop even that, but the two-phase form stays
    declarative and exact for the oracle. Groups with fewer than k
    distinct keys report their EXACT count (est = n when h_k is the
    max of fewer than k values — standard KMV small-set behavior)."""
    from pyspark.sql import Window

    from pyspark.sql.types import StringType

    from mesin_spark.functions import mul_mod32

    if isinstance(df.schema[key_col].dataType, StringType):
        # string keys: the long cast would null every row (or raise under
        # ANSI) and the sketch would silently estimate ~1 distinct; the
        # rolling polynomial fingerprint is the portable integer form
        key = token_fingerprint(F.col(key_col))
    else:
        key = F.col(key_col).cast("long")
    h = mul_mod32(key, 2654435761).alias("h")
    distinct_h = df.select(F.col(group_col).alias("grp"), h).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    topk = distinct_h.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    return (
        topk.groupBy("grp")
        .agg(
            F.sort_array(F.collect_list("h")).alias("kmv"),
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").alias("h_k"),
        )
        .select(
            F.col("grp").alias(group_col),
            "kmv",
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise((F.lit(float(k - 1))) / (F.col("h_k") / F.lit(float(1 << 32))))
            .alias("est_distinct"),
        )
    )


def kmv_overlap(
    sketches: DataFrame,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Distinct-set OVERLAP estimates between every pair of groups from
    their KMV sketches alone — the two raw key sets are never joined.

    Estimator (Beyer et al. 2007): for sketches A, B keep the k smallest
    of A ∪ B (threshold τ = its max); K∩ = |{h ∈ A ∩ B : h ≤ τ}| gives
    Jaccard ≈ K∩/k and |A ∩ B| ≈ Jaccard · D∪ with D∪ = (k-1)/(τ/2³²).
    Everything runs on the sketch ARRAYS with built-in higher-order
    functions: the pair join moves k longs per group pair, so estimating
    all-pairs source overlap over a 100 TB corpus costs one sketch pass
    plus a metadata-sized self-join. Same portable hash as kmv_sketch →
    the estimate is bit-reproducible cross-engine (oracle-checkable).

    Input: kmv_sketch output (group, kmv, est_distinct). Output one row
    per unordered pair (grp_a < grp_b)."""
    a = sketches.select(
        F.col(group_col).alias("grp_a"), F.col("kmv").alias("kmv_a")
    )
    b = sketches.select(
        F.col(group_col).alias("grp_b"), F.col("kmv").alias("kmv_b")
    )
    pairs = a.join(b, F.col("grp_a") < F.col("grp_b"))
    union_k = F.slice(F.array_sort(F.array_union("kmv_a", "kmv_b")), 1, k)
    tau = F.element_at(union_k, F.size(union_k))
    both = F.array_intersect("kmv_a", "kmv_b")
    k_int = F.size(F.filter(both, lambda h: h <= tau))
    k_eff = F.size(union_k)
    jacc = k_int / k_eff
    d_union = F.when(
        k_eff < F.lit(k), k_eff.cast("double")
    ).otherwise(F.lit(float(k - 1)) / (tau / F.lit(float(1 << 32))))
    return pairs.select(
        "grp_a",
        "grp_b",
        jacc.alias("jaccard_est"),
        (jacc * d_union).alias("overlap_est"),
    )


def kmv_union(
    sketches: DataFrame,
    k: int = 64,
) -> DataFrame:
    """Distinct count of the UNION of every sketched group, from the
    sketches alone: merge all kmv arrays (flatten → distinct → sort →
    keep k — the KMV merge operation), then apply the same (k-1)/(τ/2³²)
    estimator. One 1-row aggregate over group-count×k longs; at 100 TB
    this answers "how many distinct users/documents across ALL sources"
    without ever recounting the raw union. Same portable hash ⇒
    bit-reproducible cross-engine."""
    merged = sketches.agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmv")))), 1, k
        ).alias("m")
    )
    tau = F.element_at("m", F.size("m"))
    return merged.select(
        F.size("m").alias("n_kept"),
        F.when(F.size("m") < k, F.size("m").cast("double"))
        .otherwise(F.lit(float(k - 1)) / (tau / F.lit(float(1 << 32))))
        .alias("est_distinct_union"),
    )


def kmv_kway(
    sketches: DataFrame,
    group_col: str,
    groups: list,
    k: int = 64,
) -> DataFrame:
    """k-way intersection/union estimates over a FIXED group list from the
    KMV sketches alone — the generalization of kmv_overlap past pairs.

    Common-threshold multi-KMV (Beyer et al. 2007 §4): merge the chosen
    groups' sketches, keep the k smallest distinct hashes (τ = their max,
    D∪ = (k-1)/(τ/2³²), exact k_eff below k); every retained hash h ≤ τ is
    a uniform sample of the union, and its membership profile (which
    groups' sketches contain it) estimates ANY subset statistic:
    |∩S| ≈ |{h ≤ τ : h in every g∈S}| / k_eff · D∪.

    For three groups (a, b, c) the output is ONE row with the direct union
    estimate plus all intersection terms and the inclusion-exclusion sum
    union_ie = Σ singles − Σ pairs + triple. At the counting level the IE
    identity is EXACT (n_a+n_b+n_c−n_ab−n_ac−n_bc+n_abc = n_any), so
    union_ie must equal d_union bit-for-bit — an invariant the oracle
    certifies cross-engine thanks to the portable Knuth hash.

    Scale shape: everything after kmv_sketch touches ≤ |groups|·k longs —
    one explode over the group sketches, a k-row window, a 1-row broadcast
    of (τ, k_eff), one profile aggregate. Metadata cost at any corpus size.
    """
    from pyspark.sql import Window

    if len(groups) != 3:
        raise ValueError("kmv_kway currently takes exactly three groups")
    a, b, c = groups
    exploded = (
        sketches.filter(F.col(group_col).isin(list(groups)))
        .select(F.col(group_col).alias("grp"), F.explode("kmv").alias("h"))
    )
    w = Window.orderBy("h")
    uk = (
        exploded.select("h").distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .agg(F.max("h").alias("tau"), F.count(F.lit(1)).alias("k_eff"))
    )
    prof = (
        exploded.crossJoin(F.broadcast(uk))
        .filter(F.col("h") <= F.col("tau"))
        .groupBy("h")
        .agg(
            F.max(F.when(F.col("grp") == a, 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("grp") == b, 1).otherwise(0)).alias("in_b"),
            F.max(F.when(F.col("grp") == c, 1).otherwise(0)).alias("in_c"),
        )
    )
    cnt = prof.agg(
        F.count(F.lit(1)).alias("n_any"),
        F.sum("in_a").alias("n_a"),
        F.sum("in_b").alias("n_b"),
        F.sum("in_c").alias("n_c"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_ab"),
        F.sum(F.col("in_a") * F.col("in_c")).alias("n_ac"),
        F.sum(F.col("in_b") * F.col("in_c")).alias("n_bc"),
        F.sum(F.col("in_a") * F.col("in_b") * F.col("in_c")).alias("n_abc"),
    )
    joined = cnt.crossJoin(F.broadcast(uk))
    d_union = F.when(
        F.col("k_eff") < F.lit(k), F.col("k_eff").cast("double")
    ).otherwise(F.lit(float(k - 1)) / (F.col("tau") / F.lit(float(1 << 32))))

    def est(n_col):
        return F.col(n_col).cast("double") / F.col("k_eff") * F.col("d_union")

    with_d = joined.withColumn("d_union", d_union)
    ests = with_d.select(
        F.col("k_eff"),
        est("n_any").alias("est_union"),
        est("n_a").alias("est_a"),
        est("n_b").alias("est_b"),
        est("n_c").alias("est_c"),
        est("n_ab").alias("est_ab"),
        est("n_ac").alias("est_ac"),
        est("n_bc").alias("est_bc"),
        est("n_abc").alias("est_abc"),
    )
    union_ie = (
        F.col("est_a") + F.col("est_b") + F.col("est_c")
        - F.col("est_ab") - F.col("est_ac") - F.col("est_bc")
        + F.col("est_abc")
    )
    return ests.withColumn("union_ie", union_ie)


def merge_kmv_arrays(arrays: list, k: int = 64) -> list:
    """Driver-side KMV merge for metadata-sized sketch lists: union,
    dedup, sort, keep k — the same operation kmv_union performs in-plan,
    exposed for the streaming maintenance path where the running sketch
    lives in a tiny persisted artifact."""
    merged = sorted(set(h for a in arrays for h in a))
    return merged[:k]


def kmv_estimate(kmv: list, k: int = 64) -> float:
    """(k-1)/(h_k / 2^32) over a merged array; exact count below k."""
    if len(kmv) < k:
        return float(len(kmv))
    return (k - 1) / (kmv[k - 1] / float(1 << 32))


def maintain_kmv_stream(
    stream_df,
    key_col: str,
    sketch_path: str,
    checkpoint: str,
    k: int = 64,
):
    """Streaming distinct-count maintenance WITHOUT a state store: each
    micro-batch computes its own KMV sketch (one aggregate over the
    batch), merges with the persisted array driver-side (k longs — pure
    metadata), and rewrites the artifact. The running estimate is
    available to ANY reader at any time by loading k longs — no
    streaming query to join against, no HLL state in the checkpoint —
    and sketches from independent streams/sources merge associatively.
    Exactly-once via the checkpoint (replayed batches would be harmless
    anyway: KMV merge is idempotent — the union of the same values
    changes nothing, unlike additive counters)."""
    import json
    import os

    from pyspark.sql import functions as F

    from mesin_spark.functions import mul_mod32

    def _update(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        from pyspark.sql.types import StringType

        if isinstance(batch_df.schema[key_col].dataType, StringType):
            key = token_fingerprint(F.col(key_col))
        else:
            key = F.col(key_col).cast("long")
        h = mul_mod32(key, 2654435761).alias("h")
        rows = (
            batch_df.select(h)
            .distinct()
            .orderBy("h")
            .limit(k)
            .collect()
        )
        batch_kmv = [r["h"] for r in rows]
        state_file = os.path.join(sketch_path, "kmv.json")
        if os.path.exists(state_file):
            with open(state_file) as f:
                prior = json.load(f)["kmv"]
        else:
            os.makedirs(sketch_path, exist_ok=True)
            prior = []
        merged = merge_kmv_arrays([prior, batch_kmv], k=k)
        # atomic replace: truncating in place would destroy the
        # accumulated sketch if the driver dies mid-write
        tmp = state_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"k": k, "kmv": merged, "est": kmv_estimate(merged, k)}, f)
        os.replace(tmp, state_file)

    return (
        stream_df.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


# -- Portable HyperLogLog ----------------------------------------------------
#: Portable HLL parameters, inlined literally into oracle SQL: hash
#: h = (key·A + C) mod P; bucket = h mod M; rank window is the remaining
#: h div M < P/M < 2^24 bits. alpha_64 is the standard HLL bias constant
#: for m=64 (Flajolet et al. 2007).
HLL_A = 2654435761
HLL_C = 104729
HLL_P = 1_000_000_007
HLL_M = 64
HLL_WBITS = 24
HLL_ALPHA = 0.709


def hll_portable_registers(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """The register stage of :func:`hll_portable`, exposed on its own:
    (group..., _b bucket, _reg max-rank) — the mergeable partial a
    rollup re-aggregates (elementwise max) and the unit the merge
    property test checks against the SHIPPED arithmetic (a private test
    copy would silently drift).

    Key handling mirrors kmv_sketch: string keys route through the
    portable polynomial fingerprint (a bare long cast would null every
    row — or raise under ANSI — and the sketch would silently estimate
    ~1 distinct), and integer keys are reduced mod P BEFORE the
    multiply: ``key * A`` overflows int64 at key ≈ 3.5e9 — squarely
    inside a 100 TB corpus's id range (ANSI throws, non-ANSI wraps
    negative and corrupts every register). ``((k mod P)·A + C) mod P``
    is mathematically identical for k < P, so outputs are unchanged
    where the old form was correct."""
    from pyspark.sql.types import StringType

    if isinstance(df.schema[key_col].dataType, StringType):
        key = token_fingerprint(F.col(key_col))
    else:
        key = F.col(key_col).cast("long")
    hv = (F.pmod(key, F.lit(HLL_P)) * F.lit(HLL_A) + F.lit(HLL_C)) % F.lit(
        HLL_P
    )
    bucket = F.pmod(hv, F.lit(HLL_M))
    # hv < P ≈ 1e9 is exact in double, so floor-division is safe
    w = F.floor(hv / F.lit(HLL_M)).cast("long")
    rank = F.when(w == 0, F.lit(HLL_WBITS + 1)).otherwise(
        F.lit(HLL_WBITS + 1) - F.length(F.bin(w))
    )
    return (
        df.select(*group_cols, bucket.alias("_b"), rank.alias("_r"))
        .groupBy(*group_cols, "_b")
        .agg(F.max("_r").alias("_reg"))
    )


def hll_portable(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """Mergeable distinct-count sketch whose ENTIRE pipeline is exact
    integer arithmetic reproducible in any engine — the HyperLogLog
    analog of the portable MinHash/SimHash/IVF tier (the engine-native
    q_hll_rollup stays rows-only: DataSketches registers can't cross
    engines).

    Per group: hash each key with the portable LCG, split into 64
    buckets × a 24-bit rank window, keep max rank per bucket
    (one groupBy — the same mergeable partial-agg shape as
    hll_sketch_agg), then fold the registers into:

    - ``reg_csv``: the sorted ``bucket·100+rank`` register encoding as a
      CSV string — the sketch itself, EXACTLY comparable cross-engine;
    - ``s_scaled``: Σ_j 2^(25−M_j) over all 64 registers (absent
      buckets count 2^25) — the harmonic denominator as a BIT-exact
      integer;
    - ``users_est``: the HLL estimate α·m²·2^25 / s_scaled with the
      standard linear-counting small-range correction
      (est ≤ 2.5m and empty buckets → m·ln(m/zeros)) — double math on
      identical integers, identical literals, so both engines produce
      the same rounded value.

    ``floor(log2(w))`` is computed as ``length(bin(w)) − 1`` — an
    integer-exact formulation in both Spark and DuckDB (no float-log
    boundary risk at exact powers of two). Scale shape: one hash
    shuffle to (group, bucket) partials, one group re-aggregation over
    ≤64 rows per group — COUNT(DISTINCT) made composable at 100 TB."""
    regs = hll_portable_registers(df, key_col, group_cols)
    wscale = 1 << (HLL_WBITS + 1)
    n_hit = F.count(F.lit(1))
    s_scaled = (
        F.sum(F.pow(F.lit(2.0), F.lit(HLL_WBITS + 1) - F.col("_reg")).cast("long"))
        + (F.lit(HLL_M) - n_hit) * F.lit(wscale)
    ).alias("s_scaled")
    out = regs.groupBy(*group_cols).agg(
        n_hit.alias("n_hit"),
        s_scaled,
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.col("_b") * 100 + F.col("_reg"))),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("reg_csv"),
    )
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M * wscale) / F.col("s_scaled")
    zeros = F.lit(HLL_M) - F.col("n_hit")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
    ).otherwise(raw)
    from mesin_spark.functions import stable_round

    return out.select(
        *group_cols, "n_hit", "s_scaled", "reg_csv",
        stable_round(est, 6).alias("users_est"),
    )


def hash_sample_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_col: str,
    m: int = 256,
    qs: tuple = (0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Mergeable quantile sketch per group: keep the m rows with the
    SMALLEST portable hash of a unique row key (a deterministic uniform
    sample — the bottom-m hash set of a union is the merge of per-shard
    bottom-m sets, the same property KMV uses), then read quantiles off
    the sorted sample by EXPLICIT index arithmetic
    (vals[floor(q·(n−1))+1], lower nearest-rank) instead of an
    engine-native percentile whose interpolation rules differ across
    engines. Every step — Knuth hash, row selection, sort, index — is
    exact integer/double arithmetic, so the ESTIMATES are
    bit-reproducible cross-engine (the q_kmv_distinct property, for
    quantiles: DataSketches KLL blobs can't give an independent oracle
    this). Sampling error is the usual ~1/√m on quantile position.

    Shape: one per-group rank window over (hash, key) + a bounded
    collect (≤m values per group). Like kmv_sketch, the declarative
    two-phase form pays a full sort-shuffle where a native k-state UDAF
    would bound memory map-side — the exact-oracle trade, same note.
    Groups with ≤m rows report their EXACT quantiles (the sample is the
    population)."""
    from pyspark.sql import Window

    from mesin_spark.functions import mul_mod32, stable_round

    h = mul_mod32(F.col(key_col), 2654435761).alias("_h")
    w = Window.partitionBy("_grp").orderBy("_h", "_key")
    sample = (
        df.select(
            F.col(group_col).alias("_grp"),
            F.col(value_col).cast("double").alias("_v"),
            F.col(key_col).alias("_key"),
            h,
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= m)
    )
    agg = sample.groupBy("_grp").agg(
        F.sort_array(F.collect_list("_v")).alias("_vals"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    cols = [F.col("_grp").alias(group_col), "n_kept"]
    for q in qs:
        idx = (F.floor(F.lit(float(q)) * (F.col("n_kept") - 1)) + 1).cast("int")
        cols.append(
            stable_round(F.element_at(F.col("_vals"), idx), 4).alias(
                f"q{int(round(q * 100))}"
            )
        )
    return agg.select(*cols)
