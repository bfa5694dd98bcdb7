"""Iterative graph algorithms on DataFrames — the tier next to
dedup_clusters' connected components (ext/dedup.py): same Pregel-style
loop discipline (per-round join+agg, eager localCheckpoint so the
logical plan stays flat across iterations — the lesson dedup_clusters
measured at 8-11s/round of pure planning without it).

The reference has no graph surface; this is charter extension. Spark's
GraphX is JVM/RDD-only and GraphFrames is an external package — the
DataFrame formulation below is the dependency-free shape, and its
per-round cost is two keyed shuffles (contribution groupBy + rank
join), both on the node id, so a 100 TB edge list partitions cleanly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mesin_spark.ext.ckpt import ckpt


def _measured_edge_pin(
    e: DataFrame,
    key: str,
    prepartition: bool | str = "auto",
    prepartition_min_bytes: float = 192 * 2**20,
    target_partition_bytes: float = 64 * 2**20,
) -> DataFrame:
    """Measured prepartition for a STATIC edge frame consumed by every
    round of an iterative loop (the dedup_clusters round-11 discipline,
    shared by the graph tier): checkpoint leaves surface
    UnknownPartitioning, so each round's aggregate otherwise re-emits
    per-partition-distinct keys through a partial-combine exchange —
    edge-order bytes PER ROUND at the 100x probe (hits 3.2 GiB, ppr
    1.3 GiB, pagerank 0.7 GiB). Past the measured cutoff the frame
    exchanges ONCE by the loop's grouping (broadcast-score path) or
    join (keyed-shuffle path) key and pins (PinnedCache); rounds then
    aggregate/join in place. Below it the AQE-coalesced rounds are kept
    (a fixed-width repartition is exempt from coalescing — measured 2x
    slower on bench-scale data). Integer-arithmetic loops are
    value-identical across routes; float loops may move final ulps
    (summation grouping), the caveat their rows-only certification
    already carries — and the auto cutoff never flips at oracle-sweep
    scales."""
    if prepartition not in (True, False, "auto"):
        raise ValueError(
            f"prepartition must be True, False, or 'auto' — got {prepartition!r}"
        )
    if prepartition is False:
        return e
    from mesin_spark.ext.measure import partition_width, row_bytes_expr

    st = e.agg(F.sum(row_bytes_expr(e, list(e.columns))).alias("_b")).collect()[0]
    est_bytes = float(st["_b"] or 0)
    if prepartition == "auto" and est_bytes < prepartition_min_bytes:
        return e
    from mesin_spark.ext.pin import PINNED

    width = partition_width(e, est_bytes, target_partition_bytes)
    return PINNED.pin(e.repartition(width, F.col(key)))


def pagerank_round(
    nodes: DataFrame,
    e_norm: DataFrame,
    ranks: DataFrame,
    damping: float,
    n: int,
    carry_prev: bool = False,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """ONE power-iteration round — the exact frame pagerank() builds per
    loop step, exposed so plan tests assert on the real implementation
    instead of a hand-built replica. ``nodes`` carries (node, is_dang),
    ``e_norm`` (src, dst, w=1/outdeg), ``ranks`` (node, is_dang, rank).

    ``carry_prev=True`` keys the update join on ``ranks`` instead of
    ``nodes`` so the OLD rank rides along as ``_prev``: the tol
    convergence check in pagerank() is then a 1-row agg on the
    already-checkpointed round output — no rank-pairing join, no extra
    shuffle (a separate new⋈old delta join measured SLOWER than the two
    rounds it saved at sf0.1). It must be requested ONLY for a round
    that is immediately checkpointed: referencing ``ranks`` on both
    sides doubles the logical plan per round, so chaining carry_prev
    rounds un-truncated grows the plan 2^rounds (measured as a
    multi-minute analysis hang at checkpoint_every=10).

    ``broadcast_ranks=True`` is the small-vertex-set route (the
    broadcast-join analogue for iterative graph algorithms): the rank
    vector — one (node, rank) row per vertex, NOT the edge list —
    broadcasts into the e_norm scan, and the contribution aggregate's
    map-side partial combine means the round's ONLY exchange moves
    ≤ |V| partially-summed rows; the update join then broadcasts the
    equally-small contribs frame back against nodes. Per round: one
    tiny shuffle instead of the shuffle path's four exchanges (the
    static frames re-shuffle every round because localCheckpoint
    surfaces UnknownPartitioning under AQE — see pagerank()). The edge
    list itself never moves in either path."""
    if broadcast_ranks:
        rk = ranks.select("node", "rank")
        contribs = (
            e_norm.join(F.broadcast(rk), e_norm["src"] == rk["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("in_sum"))
        )
    else:
        contribs = (
            ranks.join(e_norm, ranks["node"] == e_norm["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("in_sum"))
        )
    dangling = ranks.filter("is_dang").agg(
        F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
    )
    new_rank = (
        F.lit((1.0 - damping) / n)
        + F.lit(damping) * (F.col("_dm") / n + F.coalesce("in_sum", F.lit(0.0)))
    ).alias("rank")
    cb = F.broadcast(contribs) if broadcast_ranks else contribs
    if carry_prev:
        return (
            ranks.join(cb, ranks["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select("node", "is_dang", F.col("rank").alias("_prev"), new_rank)
        )
    return (
        nodes.join(cb, nodes["node"] == contribs["dst"], "left")
        .crossJoin(F.broadcast(dangling))
        .select("node", "is_dang", new_rank)
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 10,
    checkpoint_every: int = 2,
    tol: float | None = None,
    broadcast_ranks: bool | None = None,
    broadcast_max_nodes: int = 8_000_000,
    final_checkpoint: bool = True,
) -> DataFrame:
    """PageRank over a directed edge list (duplicate edges collapse).

    ``final_checkpoint=False`` skips the last round's materialization: a
    caller that consumes the result exactly once (one collect / one sink
    write) would otherwise pay a whole Spark job to materialize ranks the
    very next job re-reads. The returned frame then carries the (at most
    checkpoint_every) rounds since the previous checkpoint as lazy plan.
    Keep the default when the result is reused.

    ``tol`` bounds the SINGLE-ROUND max rank delta, evaluated at
    checkpoint rounds (the round output carries the previous rank, so
    the check is one 1-row aggregate on the materialized frame). Note a
    single-round delta is smaller than the k-round-window delta an
    earlier revision compared, by roughly the geometric tail factor
    1/(1-damping·λ) — a tol calibrated against window semantics exits
    sooner here; calibrate against measured single-round deltas (the
    registry q_pagerank documents its sweep).

    rank' = (1-d)/N + d·(Σ_in rank/outdeg + dangling_mass/N), the
    standard power iteration with dangling-node redistribution so ranks
    sum to 1 every round. Fixed iteration count keeps runs comparable.
    Returns (node, rank).

    Per-round plan discipline:
    - 1/outdeg folds into the edge list ONCE (``e_norm``), so the round
      is a single ranks⋈e_norm join + groupBy(dst) — not a per-round
      outdeg join.
    - every node carries a precomputed ``is_dang`` flag (no out-edges)
      that survives each rank update, so the dangling mass is a MAP-SIDE
      filter + 1-row aggregate — no per-round join and no driver
      ``.collect()``; the 1-row frame crossJoins back in as a broadcast.
    - checkpoint every k rounds, not every round: the in-between round's
      rank subtree is shared by the next round's branches through a
      reused shuffle exchange, so skipping the materialization drops a
      per-round job without recompute; past k≈4 un-truncated plan growth
      costs more than it saves (measured at sf0.1: every-1 6.1s,
      every-2 4.9s, every-4 4.5s, never 11.7s), and periodic truncation
      keeps recovery bounded.
    Note: under AQE a checkpoint of either backend does NOT preserve
    hash partitioning (LogicalRDD surfaces UnknownPartitioning —
    verified on the executed plan), so the static e_norm/nodes frames
    re-shuffle each round (4 exchanges/round vs the algorithmic
    minimum 2). Checkpoints go through ext.ckpt.ckpt: the default
    ``local`` backend keeps blocks executor-local (fast, but a lost
    executor kills the iteration — no lineage survives truncation);
    set ``mesin.checkpoint.backend=reliable`` (+
    ``mesin.checkpoint.dir`` on durable storage) on a real cluster so
    node churn refetches from storage instead of failing a 40-round
    job. Results are backend-identical (pytest-asserted). The
    obvious fix — repartition the static frames once on their join keys
    and persist() (which DOES keep outputPartitioning) — was measured
    and REJECTED at bench scale: a fixed-width repartition is exempt
    from AQE coalescing, so every round ran 32-partition stages of tiny
    tasks instead of AQE's ~3 coalesced ones, and scheduling overhead
    doubled the wall time (5.4s → 10.9s min at sf0.1). The trade
    inverts when partitions carry real data (a cluster-sized edge
    list): there, pre-partition the edge list once, Pregel-style, and
    size the width to the data — the plan shape supports it, local mode
    just must not pay it.

    ``broadcast_ranks`` (None = auto by node count): the rank vector is
    one row per VERTEX — orders of magnitude smaller than the edge list
    it multiplies against — so when |V| ≤ broadcast_max_nodes it
    broadcasts into the edge scan exactly like a small dimension into a
    fact join, collapsing the round to ONE ≤|V|-row exchange (see
    pagerank_round). The 8M default is ~128 MB of (int64 node, double
    rank) pairs at 16 B/row — the scale where Spark's own broadcast
    guidance tops out; a web-scale graph with billions of vertices
    auto-falls back to the shuffle path, whose per-round cost is the
    two keyed exchanges that ARE Pregel. |V| is already counted for the
    teleport term, so the auto-route adds zero work.

    Setup has two shapes keyed off the same knob, and the auto route is
    resolved BEFORE setup (one map-side approx_count_distinct pre-pass
    over the raw edges when ``broadcast_ranks=None``), so an auto-big
    graph gets the skew-safe setup too — not only explicit False.
    Small-graph (auto-small / True): 1/outdeg folds into the edge list
    via a count window over
    the just-deduplicated edges — two exchanges, ONE scan of the raw
    edge build, no edges⋈outdeg self-join, and the node frame derives
    from the checkpointed e_norm without re-reading the raw build
    (two materializations instead of three; measured −0.7s of
    q_pagerank's sf0.1 wall). Big-graph (auto-big / explicit False): the window
    would buffer each src's full edge group in one task — a power-law
    hub with 10^8 out-edges is a straggler/spill risk — so that path
    keeps the skew-safe groupBy(src) outdeg (map-side partial combine)
    joined back to the edges, the classic Pregel prep."""
    from pyspark.sql import Window

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if broadcast_ranks is None:
        # Resolve the auto route BEFORE the setup branch: the two setup
        # shapes differ too (window outdeg buffers a hub's whole edge
        # group — a straggler/spill risk on exactly the graphs that must
        # not broadcast), so an auto-big graph needs the skew-safe
        # groupBy setup as well, not just shuffle rounds. One map-side
        # HLL aggregate over the raw edges; |distinct src| + |distinct
        # dst| is an upper bound on |V|, i.e. conservative in the safe
        # direction (never broadcasts a too-big rank vector).
        est_nodes = edges.agg(
            (
                F.approx_count_distinct(src) + F.approx_count_distinct(dst)
            ).alias("n")
        ).head()["n"]
        broadcast_ranks = est_nodes <= broadcast_max_nodes
    if broadcast_ranks is False:
        e = e.distinct().transform(ckpt, eager=True)
        outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
        e_norm = (
            e.join(outdeg, "src")
            .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
            .transform(ckpt, eager=True)
        )
    else:
        # one exchange instead of two: hash(src) satisfies BOTH the
        # (src,dst) dedup agg's clustering (subset rule) and the outdeg
        # window's, so distinct and window reuse the same repartition.
        # repartition(col) with no fixed width stays AQE-coalescible
        # (only repartition(N, col) is exempt — the rejected pattern).
        # Hub-group buffering is this route's documented, accepted risk:
        # the broadcast route is only taken when |V| is dim-table-sized.
        e_norm = (
            e.repartition(F.col("src"))
            .distinct()
            .withColumn(
                "w", F.lit(1.0) / F.count(F.lit(1)).over(Window.partitionBy("src"))
            )
            .transform(ckpt, eager=True)
        )
    # (node, is_dang) in ONE aggregate (round 12): src rows vote
    # has-out=true, dst rows vote false, max() settles each node — the
    # previous shape (srcs distinct + union distinct + left join) paid
    # an extra exchange and a join for the same integer-exact output.
    # Same keys as the old union-distinct, so no new skew exposure.
    nodes = (
        e_norm.select(F.col("src").alias("node"), F.lit(True).alias("_o"))
        .union(e_norm.select(F.col("dst").alias("node"), F.lit(False).alias("_o")))
        .groupBy("node")
        .agg((~F.max("_o")).alias("is_dang"))
        .transform(ckpt, eager=True)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError(
            "pagerank: edge list is empty (after any upstream filter) — "
            "no graph to rank"
        )
    # edge prepartition MEASURED AND REJECTED here (round 11): unlike
    # hits (whose 12 half-round combines emitted edge-order bytes —
    # 3.2 GiB at 100x), pagerank's per-round combine output is |V|-small
    # (~40 MiB/round at 100x), so pinning e_norm by the group key ADDED
    # an edge-sized exchange without per-round savings (744 → 1,109 MiB
    # measured at the 100x probe). The per-round partial-combine
    # exchange IS this loop's floor.
    # NOT checkpointed: the initial ranks frame is a constant-literal
    # projection of the just-checkpointed nodes frame — re-evaluating it
    # per round-1 branch is a map-side no-op, and skipping the eager
    # materialization saves one full job per run (measured ~0.3s of the
    # registry query's wall time)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(max_iter):
        at_ckpt = (it + 1) % max(1, checkpoint_every) == 0 or it == max_iter - 1
        check_tol = at_ckpt and tol is not None and it < max_iter - 1
        # carry_prev only on a round that is checkpointed RIGHT AFTER —
        # see pagerank_round: an un-truncated carry_prev chain doubles
        # the logical plan per round
        ranks = pagerank_round(
            nodes,
            e_norm,
            ranks,
            damping,
            n,
            carry_prev=check_tol,
            broadcast_ranks=broadcast_ranks,
        )
        if at_ckpt:
            if it < max_iter - 1 or final_checkpoint:
                ranks = ranks.transform(ckpt, eager=True)
            if check_tol:
                # convergence exit, evaluated only at checkpoint rounds:
                # the round output carries the previous rank as _prev,
                # so the single-round max delta is one 1-row aggregate
                # over the JUST-materialized frame — no rank-pairing
                # join, no extra shuffle, zero cost when tol is unset
                delta = ranks.agg(
                    F.max(F.abs(F.col("rank") - F.col("_prev")))
                ).collect()[0][0]
                if delta is not None and delta < tol:
                    break
                ranks = ranks.drop("_prev")
    return ranks.select("node", "rank")


def degree_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node in/out degree in one pass over the (deduplicated) edge
    list — the graph profile read before choosing partitioning for an
    iterative run (a power-law hub predicts the same hot-key trouble
    q_key_skew scores for joins)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    outd = e.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("out_deg"))
    ind = e.groupBy(F.col("dst").alias("node")).agg(F.count(F.lit(1)).alias("in_deg"))
    return (
        outd.join(ind, "node", "full")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED simple graph (the
    third classic graph kernel next to pagerank/degrees; the reference
    has no graph surface). Returns (node, triangles) for every node in
    at least one triangle.

    Plan — the degree-ordered "node-iterator++" shape that bounds the
    join fan-out at scale:
    1. canonicalize to (u < v) distinct edges, self-loops dropped;
    2. compute degrees (one agg), orient every edge from the lower
       (degree, id) endpoint to the higher — every triangle then exists
       EXACTLY once as a<b<c with oriented edges a→b, b→c, a→c;
    3. wedge join (a→b)⋈(b→c) on b, closed by a semi-ish inner join to
       the oriented edge set on (a,c);
    4. explode each triangle's three corners and count per node.
    The orientation caps each node's out-degree at O(sqrt(edges)) on
    skewed graphs — the wedge join's fan-out bound that makes this the
    standard distributed triangle algorithm (hub nodes emit no wedges;
    their triangles are counted from their low-degree corners)."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # the canonicalized edge list feeds the degree agg AND the
        # orientation join; materialize once (same discipline as
        # pagerank's e_norm) instead of re-running the dedup shuffle
        .transform(ckpt, eager=True)
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .union(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
        # o fans out into all three legs of the wedge join — without a
        # materialization the orient join would execute three times
        .transform(ckpt, eager=True)
    )
    e1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = o.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    return (
        tri.select(
            F.explode(F.array(F.col("x"), F.col("y"), F.col("z"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )


def link_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_center_degree: int | None = None,
) -> DataFrame:
    """Common-neighbor and Adamic-Adar scores for NON-adjacent node
    pairs — the classic link-prediction features a recommender training
    pipeline labels positives/negatives with. Returns
    (a, b, common_neighbors, adamic_adar) with a < b.

    Plan: symmetric adjacency (one union), per-center neighbor pairing
    (self-join on the center), degree join for the 1/ln(deg) weight, one
    groupBy(a,b) — then a left_anti against the edge set so only
    candidate (absent) links remain. A center of degree d emits C(d,2)
    pairs, so hubs dominate cost quadratically; ``max_center_degree``
    drops centers above the cap (the standard approximation — a
    neighbor-of-everything hub carries ~zero Adamic-Adar signal anyway,
    weight 1/ln(d)), bounding the shuffle at scale. Degree-1 centers
    emit no pairs, so the ln(deg)=0 singularity is unreachable."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .transform(ckpt, eager=True)
    )
    adj = e.select(F.col("u").alias("n"), F.col("v").alias("nb")).union(
        e.select(F.col("v").alias("n"), F.col("u").alias("nb"))
    )
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    centers = adj.join(deg, "n")
    if max_center_degree is not None:
        centers = centers.filter(F.col("d") <= max_center_degree)
    a1 = centers.select(F.col("n").alias("w"), F.col("nb").alias("a"), "d")
    a2 = centers.select(F.col("n").alias("w"), F.col("nb").alias("b"))
    pairs = a1.join(a2, "w").filter(F.col("a") < F.col("b"))
    scored = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum(F.lit(1.0) / F.log(F.col("d").cast("double"))).alias("adamic_adar"),
    )
    return scored.join(
        e.select(F.col("u").alias("a"), F.col("v").alias("b")),
        ["a", "b"],
        "left_anti",
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
) -> DataFrame:
    """Nodes of the k-core — the maximal induced subgraph where every
    node keeps degree ≥ k — by synchronous peeling: drop all nodes of
    degree < k, recompute degrees in the induced subgraph, repeat to the
    fixpoint (the k-core is mathematically UNIQUE, so any engine
    reaching the fixpoint agrees bit-exactly regardless of round count).
    Returns (node, core_degree).

    Per round: one degree agg + two semi-joins on the node id, induced
    edge set checkpointed eagerly (flat lineage, the pagerank
    discipline); the edge count rides the checkpoint materialization,
    so the fixpoint test costs one bounded driver read per round — and
    the edge set only ever SHRINKS, so rounds get cheaper as they
    proceed. Graphs peel in O(log n)-ish rounds in practice;
    ``max_rounds`` bounds pathological chains."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .transform(ckpt, eager=True)
    )
    n_edges = e.count()
    converged = False
    for _ in range(max_rounds):
        if n_edges == 0:
            converged = True
            break
        deg = (
            e.select(F.col("u").alias("n"))
            .union(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("n")
        e2 = (
            e.join(keep.select(F.col("n").alias("u")), "u", "left_semi")
            .join(keep.select(F.col("n").alias("v")), "v", "left_semi")
            .transform(ckpt, eager=True)
        )
        n2 = e2.count()
        if n2 == n_edges:
            converged = True
            break  # fixpoint: every surviving node already has degree >= k
        e, n_edges = e2, n2
    if not converged and n_edges == 0:
        # the LAST allowed round peeled to the empty graph: that IS the
        # fixpoint (nothing left to shrink) — the in-loop emptiness check
        # only runs at the top of the next iteration, which never happens
        converged = True
    if not converged:
        # a partial peel is a SUPERSET of the true k-core, and the final
        # core_degree filter below would mask it — the unique-fixpoint
        # contract the cross-engine oracle depends on would silently
        # break on a pathological chain graph. Fail loudly instead.
        raise RuntimeError(
            f"k_core: peeling did not reach the fixpoint within "
            f"max_rounds={max_rounds} rounds ({n_edges} edges still "
            f"shrinking) — raise max_rounds"
        )
    return (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .filter(F.col("core_degree") >= k)
    )


#: Portable walk-hash constants (mirrored literally in oracle SQL):
#: step chooser H(u, t) = ((u*A + t*B + C) mod P) mod deg(u).
WALK_A = 1315423911
WALK_B = 2654435761
WALK_P = 1_000_000_007
WALK_C = 104729


def random_walks(
    edges: DataFrame,
    n_steps: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic 'random' walks from EVERY node — the
    DeepWalk/node2vec corpus generator, made exactly reproducible (and
    so cross-engine checkable) by replacing the RNG with a portable
    integer hash: at step t on node u the walker moves to the neighbor
    with rank ``((u*A + t*B + C) mod P) mod deg(u)`` in the id-ordered
    adjacency list. Same trajectory on any engine, any partitioning,
    any rerun — the property a training pipeline needs for cacheable
    walk corpora anyway (true RNG walks are rows-only-verifiable).

    Plan: adjacency ranked once (one sort-window per node), then one
    keyed join per step against the ranked list — walk state is
    (start, cur), so each step shuffles on the current node id only;
    the frontier stays |nodes| rows for all T steps. Returns
    (start, step, node) with step 0 = the start itself."""
    from pyspark.sql import Window as W

    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = (
        e.select(F.col("u").alias("n"), F.col("v").alias("nb"))
        .union(e.select(F.col("v").alias("n"), F.col("u").alias("nb")))
        .withColumn("rk", F.row_number().over(W.partitionBy("n").orderBy("nb")) - 1)
    )
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    adj = adj.join(deg, "n").transform(ckpt, eager=True)
    walk = adj.select(F.col("n").alias("start")).distinct().select(
        "start", F.lit(0).alias("step"), F.col("start").alias("node")
    )
    out = [walk]
    cur = walk
    for t in range(1, n_steps + 1):
        # node reduces mod P BEFORE the multiply — arithmetically
        # identical ((n·A) mod P = ((n mod P)·A) mod P) but every
        # intermediate stays < (P−1)·A ≈ 1.4e18 < 2^63: the naive
        # product overflows ANSI int64 once ids pass 2^63/A ≈ 7e9,
        # squarely inside a 100 TB corpus's id range (found live by the
        # 100x scale sweep, whose shard-shifted ids reach 9.9e9 — the
        # mul_mod32 lesson applied to the walk hash)
        pick = (
            (
                F.pmod(F.col("node"), F.lit(WALK_P)) * F.lit(WALK_A)
                + F.lit(t) * F.lit(WALK_B)
                + F.lit(WALK_C)
            )
            % F.lit(WALK_P)
        ) % F.col("deg")
        nxt = (
            cur.join(adj.select(F.col("n").alias("node"), "rk", "nb", "deg"), "node")
            .filter(F.col("rk") == pick)
            .select("start", F.lit(t).alias("step"), F.col("nb").alias("node"))
            .transform(ckpt, eager=True)
        )
        out.append(nxt)
        cur = nxt
    res = out[0]
    for w in out[1:]:
        res = res.union(w)
    return res


PR_SCALE = 10**12  # fixed-point unit for the portable pagerank

# The portable pagerank/ppr loops broadcast the full |V|-row rank vector
# every round (integer sums are order-independent, so the join strategy
# cannot perturb the fixed-point values). Same ceiling as pagerank()'s
# broadcast_max_nodes: ~128 MB of (int64, int64) pairs — past it, fail
# with a clear remedy instead of an opaque broadcast OOM.
PR_BROADCAST_MAX = 8_000_000


def pagerank_portable(
    edges: DataFrame,
    rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank in integer FIXED-POINT arithmetic — the portable-sketch
    strategy applied to the one iterative algorithm the tier still
    verified rows-only: float power iteration accumulates
    engine-specific summation order, but with ranks held in units of
    1e-12 and every operation an integer add / multiply / truncating
    div, two engines running the same round count agree BIT-EXACTLY.
    Truncation leaks mass (~1e-12/node/round — far below any ranking
    decision); damping 0.85 becomes *85 div 100.

    Same plan strategy as pagerank()'s small-vertex-set route: the
    ≤|V|-row rank vector broadcasts into the static edge scan (integer
    sums are order-independent, so the join strategy cannot perturb the
    fixed-point values), leaving one partial-combined groupBy(dst)
    exchange per round, dangling mass as a broadcast 1-row aggregate,
    eager checkpoints. A graph whose rank vector outgrows broadcast
    range belongs on pagerank()'s shuffle path — this portable tier's
    job is cross-engine proof at certification scale.
    Returns (node, rank_fp) with rank_fp ≈ rank * 1e12."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.transform(ckpt, eager=True)
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(outdeg.select(F.col("src").alias("node"), "od"), "node", "left")
        .transform(ckpt, eager=True)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank_portable: empty edge list")
    if n > PR_BROADCAST_MAX:
        raise ValueError(
            f"pagerank_portable: {n} nodes — the rank vector exceeds "
            f"broadcast range (PR_BROADCAST_MAX={PR_BROADCAST_MAX}); use "
            "pagerank()'s shuffle path (broadcast_ranks=False) for graphs "
            "this size"
        )
    base = (15 * PR_SCALE) // (100 * n)
    # no edge pin: measured and rejected for the pagerank loop shape
    # (|V|-small per-round combine output — see pagerank()'s note)
    r = nodes.withColumn("rank", F.lit(PR_SCALE // n))
    for it in range(rounds):
        rr = r.filter(F.col("od").isNotNull())
        contrib = (
            e.join(F.broadcast(rr), rr["node"] == e["src"])
            .groupBy("dst")
            .agg(F.sum(F.expr("rank div od")).alias("c"))
        )
        dang = r.filter(F.col("od").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).alias("_dg")
        )
        r = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "od",
                (
                    F.lit(base)
                    + F.expr(f"(85 * (coalesce(c, 0) + (_dg div {n}))) div 100")
                ).alias("rank"),
            )
        )
        if (it + 1) % 2 == 0 or it == rounds - 1:
            r = r.transform(ckpt, eager=True)
    return r.select("node", F.col("rank").alias("rank_fp"))


HITS_SCALE = 10**6  # fixed-point unit for portable HITS (see overflow note)


def hits_portable(
    edges: DataFrame,
    rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS (Kleinberg hubs & authorities) in integer fixed-point
    arithmetic — the portable-proof strategy applied to the second
    classic iterative ranking: authority(v) = Σ_{u→v} hub(u), hub(u) =
    Σ_{u→v} authority(v), each vector L1-normalized to HITS_SCALE per
    half-round via truncating integer division, so the full hub AND
    authority vectors are bit-reproducible cross-engine. On a bipartite
    graph (the customer→supplier purchase edges) HITS is the natural
    ranking: hubs = buyers, authorities = suppliers.

    Overflow bound: after normalization Σ scores = ~HITS_SCALE (1e6),
    so a raw half-round sum ≤ HITS_SCALE·max_degree and the
    normalization multiply raw·HITS_SCALE needs
    max_degree < 2^63 / HITS_SCALE² ≈ 9.2e6 — runtime-guarded by
    folding the check INTO the consumed norm column (a CASE that
    raise_error()s on overflow); a detached assert_true column would be
    removed by ColumnPruning and never evaluate (a graph with hotter
    hubs than that needs a wider unit split, the mul_mod32 lesson).

    Per round: the score vector (≤ n ≤ HITS_SCALE = 1e6 rows by the
    guard below, so ALWAYS broadcast-sized — no auto knob needed,
    unlike pagerank's unbounded |V|) broadcasts into the static edge
    scan, leaving one partial-combined aggregate exchange per
    half-round plus two broadcast 1-row norms; integer sums are
    order-independent, so the join strategy cannot perturb the
    fixed-point values. Each HALF-round is eagerly checkpointed, and that cadence
    is structural, not tunable: the normalization crossJoin references
    the raw half-round frame TWICE (once for values, once for the
    norm), so an un-truncated chain doubles the logical plan per
    half-round — the same 2^rounds analysis blowup the pagerank
    carry_prev note documents. Measured two-scale slope 1.48 at 3×
    data. Returns (node, hub_fp, auth_fp) with absent sides as 0."""
    if rounds < 1:
        # rounds=0 would leave the authority frame unbuilt and crash at
        # the final join with an opaque TypeError — refuse up front.
        raise ValueError("hits_portable: rounds must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.transform(ckpt, eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .transform(ckpt, eager=True)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("hits_portable: empty edge list")
    if n > HITS_SCALE:
        # HITS_SCALE // n would floor every initial hub score to 0 and
        # poison round 1 (NULL authorities behind a misleading overflow
        # assert). The 1e6-unit scale caps the node count the same way
        # it caps max degree — fail loudly with the actual remedy.
        raise ValueError(
            f"hits_portable: {n} nodes exceeds HITS_SCALE={HITS_SCALE} — "
            "initial scores would floor to 0; use hits() (engine-native "
            "doubles, any |V|) for graphs this size, or raise HITS_SCALE "
            "and re-derive the max-degree overflow bound in the docstring"
        )
    lim = (2**63 - 1) // HITS_SCALE
    # scores always broadcast here (the HITS_SCALE guard caps |V|), so
    # pin one edge copy per GROUP key — both half-round aggregates then
    # run exchange-free (measured routing; integer sums route-identical)
    e_auth = _measured_edge_pin(e, "dst")
    e_hub = _measured_edge_pin(e, "src")
    h = nodes.withColumn("h", F.lit(HITS_SCALE // n))
    a = None
    for it in range(rounds):
        a_raw = (
            e_auth.join(F.broadcast(h), e_auth["src"] == h["node"])
            .groupBy("dst")
            .agg(F.sum("h").alias("raw"))
        )
        # The overflow guard is folded INTO the consumed `nm` column: a
        # standalone assert_true("_chk") column is never referenced
        # downstream, so ColumnPruning deletes it and the guard never
        # runs (verified empirically on Spark 4.1.2).
        na = a_raw.agg(
            F.when(F.sum("raw") <= F.lit(lim), F.sum("raw"))
            .otherwise(
                F.raise_error(F.lit("hits_portable: authority norm overflow"))
            )
            .alias("nm"),
        )
        a = (
            a_raw.crossJoin(F.broadcast(na))
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(raw * {HITS_SCALE}) div nm").alias("a"),
            )
            .transform(ckpt, eager=True)
        )
        h_raw = (
            e_hub.join(F.broadcast(a), e_hub["dst"] == a["node"])
            .groupBy("src")
            .agg(F.sum("a").alias("raw"))
        )
        nh = h_raw.agg(
            F.when(F.sum("raw") <= F.lit(lim), F.sum("raw"))
            .otherwise(F.raise_error(F.lit("hits_portable: hub norm overflow")))
            .alias("nm"),
        )
        h = (
            h_raw.crossJoin(F.broadcast(nh))
            .select(
                F.col("src").alias("node"),
                F.expr(f"(raw * {HITS_SCALE}) div nm").alias("h"),
            )
            .transform(ckpt, eager=True)
        )
    return (
        nodes.join(h, "node", "left")
        .join(a, "node", "left")
        .select(
            "node",
            F.coalesce("h", F.lit(0)).alias("hub_fp"),
            F.coalesce("a", F.lit(0)).alias("auth_fp"),
        )
    )


def hits(
    edges: DataFrame,
    rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
    broadcast_scores: bool | None = None,
    broadcast_max_nodes: int = 8_000_000,
    prepartition: bool | str = "auto",
    prepartition_min_bytes: float = 192 * 2**20,
    target_partition_bytes: float = 64 * 2**20,
) -> DataFrame:
    """HITS in engine-native doubles — the UNBOUNDED-graph sibling of
    hits_portable, exactly as pagerank() pairs with pagerank_portable:
    the portable form is the cross-engine arithmetic proof but its
    1e6-unit fixed-point scale caps both node count and max degree
    (found live: the 100x scale sweep's 1.5M-node purchase graph trips
    its envelope guard), while this form runs any |V|. Float summation
    order is engine- and partitioning-specific, so results certify
    rows-only + structural pytests (agreement with hits_portable within
    fixed-point quantization on in-envelope graphs, L1 norms, bipartite
    star dominance) — the same division of labor as q_pagerank vs
    q_pagerank_portable.

    Per half-round: authority(v) = Σ_{u→v} hub(u), then L1-normalize
    (scores sum to 1 — no overflow bound needed in doubles); hubs
    mirror it. ``broadcast_scores`` None auto-routes like pagerank():
    ≤ broadcast_max_nodes broadcasts the score vector into the static
    edge scan (one partial-combined ≤|V|-row exchange + one 1-row norm
    broadcast per half-round), larger graphs fall back to keyed-shuffle
    Pregel half-rounds. Each half-round materializes eagerly — the
    normalization references its raw aggregate twice (values + norm),
    so an un-truncated chain doubles the logical plan per half-round
    (the hits_portable cadence note; structural, not tunable). Returns
    (node, hub, auth) with absent sides as 0.0.

    ``prepartition`` (measured, default auto at ≥192 MiB edge bytes —
    the dedup_clusters discipline): the STATIC edge list otherwise
    re-exchanges every half-round THROUGH THE AGGREGATE — the checkpoint
    leaf surfaces UnknownPartitioning, so the half-round's partial
    combine emits per-partition-distinct keys (edge-order bytes, ~270
    MiB × 12 half-rounds = 3.2 GiB physical at the 100x probe, the
    heaviest graph-tier entry). HITS alternates its grouping key, so the
    route pins TWO copies of the edge frame: one partitioned by dst
    (authority halves) and one by src (hub halves) — on the
    broadcast-scores path each half's groupBy aggregates IN PLACE (zero
    exchange); on the keyed-shuffle path the copies co-partition the
    JOIN side instead (the aggregate exchange is then the Pregel
    minimum). One extra cached copy is the price. Routes may differ in
    final float ulps (summation grouping changes with partitioning —
    the exact engine-partitioning caveat this operator's rows-only
    certification already carries; the integer hits_portable is the
    bit-exact tier)."""
    if rounds < 1:
        raise ValueError("hits: rounds must be >= 1")
    if prepartition not in (True, False, "auto"):
        raise ValueError(
            f"prepartition must be True, False, or 'auto' — got {prepartition!r}"
        )
    raw = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if prepartition is False:
        e_auth = e_hub = base = raw.distinct().transform(ckpt, eager=True)
    else:
        # checkpoint the RAW projection (block store, no shuffle) so the
        # measuring aggregate and both routes read a leaf
        raw = raw.transform(ckpt, eager=True)
        from mesin_spark.ext.measure import partition_width, row_bytes_expr

        # ONE bounded aggregate measures bytes AND estimates |V| (the
        # pagerank pre-pass: |distinct src| + |distinct dst| is an upper
        # bound — conservative in the safe, never-broadcast-too-big
        # direction), so the score route resolves BEFORE the pin keys
        # are chosen
        st = raw.agg(
            F.sum(row_bytes_expr(raw, ["src", "dst"])).alias("_b"),
            (
                F.approx_count_distinct("src") + F.approx_count_distinct("dst")
            ).alias("_n"),
        ).collect()[0]
        est_bytes = float(st["_b"] or 0)
        if broadcast_scores is None:
            broadcast_scores = int(st["_n"] or 0) <= broadcast_max_nodes
        if prepartition == "auto":
            prepartition = est_bytes >= prepartition_min_bytes
        if prepartition:
            from mesin_spark.ext.pin import PINNED

            width = partition_width(raw, est_bytes, target_partition_bytes)
            # fused distinct-into-prepartition (the dedup_clusters
            # shape): one-key hash partitioning satisfies the two-key
            # dedup's clustering, so the FIRST pin's exchange is also
            # the dedup pass — 3 edge-sized exchanges become 2. The
            # second copy re-keys the already-deduped cache. Keys:
            # broadcast path partitions by the GROUP key (aggregate in
            # place); shuffle path by the JOIN key (co-partition the
            # score join; the aggregate exchange is then irreducible).
            k_auth = "dst" if broadcast_scores else "src"
            k_hub = "src" if broadcast_scores else "dst"
            e_auth = PINNED.pin(
                raw.repartition(width, F.col(k_auth)).dropDuplicates()
            )
            e_hub = PINNED.pin(e_auth.repartition(width, F.col(k_hub)))
            base = e_auth
        else:
            e_auth = e_hub = base = raw.distinct().transform(ckpt, eager=True)
    nodes = (
        base.select(F.col("src").alias("node"))
        .union(base.select(F.col("dst").alias("node")))
        .distinct()
        .transform(ckpt, eager=True)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("hits: empty edge list")
    if broadcast_scores is None:
        broadcast_scores = n <= broadcast_max_nodes

    def _bc(frame):
        return F.broadcast(frame) if broadcast_scores else frame

    def _half(edge_frame, score_frame, score_col, join_key, out_key, out_col):
        raw = (
            edge_frame.join(_bc(score_frame), edge_frame[join_key] == score_frame["node"])
            .groupBy(out_key)
            .agg(F.sum(score_col).alias("raw"))
        )
        nm = raw.agg(F.sum("raw").alias("nm"))
        return (
            raw.crossJoin(F.broadcast(nm))
            .select(
                F.col(out_key).alias("node"),
                (F.col("raw") / F.col("nm")).alias(out_col),
            )
            .transform(ckpt, eager=True)
        )

    h = nodes.withColumn("h", F.lit(1.0 / n))
    a = None
    for _ in range(rounds):
        a = _half(e_auth, h, "h", "src", "dst", "a")
        h = _half(e_hub, a, "a", "dst", "src", "h")
    return (
        nodes.join(h, "node", "left")
        .join(a, "node", "left")
        .select(
            "node",
            F.coalesce("h", F.lit(0.0)).alias("hub"),
            F.coalesce("a", F.lit(0.0)).alias("auth"),
        )
    )


def ppr_portable(
    edges: DataFrame,
    seed_mod: int = 50,
    rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
    seeds: DataFrame | None = None,
    seed_top_degree: int | None = None,
) -> DataFrame:
    """PERSONALIZED PageRank in the same integer fixed-point arithmetic
    as pagerank_portable: the teleport mass (and the dangling mass)
    restarts at a SEED set instead of all nodes, so rank concentrates
    in the seeds' neighborhood — the graph-curation primitive for
    "select documents/entities close to these trusted sources"
    (public design: Jeh & Widom 2003; dangling-to-seeds convention).

    Seeds come from ``seed_top_degree=k`` (the k highest-total-degree
    hubs, ties to the smallest id — a total order, so the set is
    engine-independent; derived from the SAME checkpointed distinct
    edge list the iteration uses, one |E|-linear degree aggregate + a
    TakeOrdered k — deriving it from a second scan of the raw edges
    measured a 38 GB re-join spill at the 100x probe), or from
    ``seeds`` (any 1-column DataFrame of node ids), else the nodes with
    ``node % seed_mod == 0`` — in every case a predicate an independent
    engine reproduces exactly, like the hash-seeded walks.
    rank'(v) = [v∈S]·(15·SCALE)//(100·s)
    + (85·(c(v) + [v∈S]·(dg//s)))//100 with c(v) = Σ_in rank//od, all
    truncating integer ops on non-negatives, so the full per-node rank
    vector is bit-reproducible cross-engine. Plan shape identical to
    pagerank_portable: broadcast rank vector into the edge scan, one
    partial-combined groupBy(dst) exchange per round, dangling mass as
    a broadcast 1-row aggregate, eager
    checkpoints every 2 rounds — node-keyed shuffles, partitions
    cleanly at 100 TB. Returns (node, rank_fp)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.transform(ckpt, eager=True)
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(outdeg.select(F.col("src").alias("node"), "od"), "node", "left")
    )
    if seed_top_degree is not None and seeds is None:
        seeds = (
            e.select(F.col("src").alias("node"))
            .unionAll(e.select(F.col("dst").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("_deg"))
            .orderBy(F.desc("_deg"), F.asc("node"))
            .limit(seed_top_degree)
            .select("node")
        )
    if seeds is not None:
        # a seed LIST (top-k hubs etc.) is k rows — broadcast the flag
        sd = (
            seeds.select(F.col(seeds.columns[0]).alias("node"))
            .distinct()
            .withColumn("_s", F.lit(True))
        )
        nodes = nodes.join(F.broadcast(sd), "node", "left").withColumn(
            "is_seed", F.coalesce(F.col("_s"), F.lit(False))
        ).drop("_s")
    else:
        nodes = nodes.withColumn("is_seed", F.col("node") % seed_mod == 0)
    nodes = nodes.transform(ckpt, eager=True)
    counts = nodes.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_seed").cast("long")).alias("s"),
    ).head()
    n, s = counts["n"], counts["s"] or 0
    if s == 0:
        raise ValueError(
            "ppr_portable: no seed nodes "
            + ("(seed frame matched nothing)" if seeds is not None
               else f"(node % {seed_mod} == 0)")
            + " in the graph — personalized teleport has nowhere to restart"
        )
    if n > PR_BROADCAST_MAX:
        raise ValueError(
            f"ppr_portable: {n} nodes — the rank vector exceeds broadcast "
            f"range (PR_BROADCAST_MAX={PR_BROADCAST_MAX}); use pagerank()'s "
            "shuffle path for graphs this size"
        )
    base = (15 * PR_SCALE) // (100 * s)
    # edge prepartition measured and REJECTED (round 11, same verdict as
    # pagerank): this loop's per-round combine output is |V|-small, and
    # the dst pin moved the 100x probe 1,331 → 1,681 MiB — the pin costs
    # an edge-sized exchange the rounds never repay. hits() is the loop
    # shape where it pays (edge-order combine output per half-round).
    r = nodes.withColumn(
        "rank",
        F.when(F.col("is_seed"), F.lit(PR_SCALE // s)).otherwise(F.lit(0)),
    )
    for it in range(rounds):
        rr = r.filter(F.col("od").isNotNull())
        contrib = (
            e.join(F.broadcast(rr), rr["node"] == e["src"])
            .groupBy("dst")
            .agg(F.sum(F.expr("rank div od")).alias("c"))
        )
        dang = r.filter(F.col("od").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).alias("_dg")
        )
        r = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "od",
                "is_seed",
                (
                    F.when(F.col("is_seed"), F.lit(base)).otherwise(F.lit(0))
                    + F.expr(
                        f"(85 * (coalesce(c, 0)"
                        f" + (case when is_seed then _dg div {s} else 0 end)))"
                        " div 100"
                    )
                ).alias("rank"),
            )
        )
        if (it + 1) % 2 == 0 or it == rounds - 1:
            r = r.transform(ckpt, eager=True)
    return r.select("node", F.col("rank").alias("rank_fp"))


def label_propagation(
    edges: DataFrame, src: str = "src", dst: str = "dst", n_rounds: int = 4
) -> DataFrame:
    """Synchronous label propagation (community detection): every node
    starts as its own label; each round every node adopts the most
    frequent label among its neighbors, ties broken to the SMALLEST
    label — fully deterministic, so a fixed round count is exactly
    cross-engine checkable (the k-core / portable-pagerank proof
    strategy; q_label_prop's oracle unrolls the same rounds).

    Per round: one node-keyed join (labels onto the symmetrized edge
    list), one (node, label) count aggregate, and one window pick of the
    modal label — two keyed shuffles, both on the node id, so a 100 TB
    edge list partitions cleanly; each round is eagerly checkpointed
    (flat lineage, the dedup_clusters lesson). Synchronous updates can
    oscillate on bipartite structure — irrelevant to correctness here
    because both engines compute the identical fixed rounds.
    Returns (node, label)."""
    from pyspark.sql import Window

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .transform(ckpt, eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .transform(ckpt, eager=True)
    )
    w = Window.partitionBy("n").orderBy(F.col("c").desc(), F.col("lbl").asc())
    for _ in range(n_rounds):
        freq = (
            sym.join(labels, sym["src"] == labels["node"])
            .groupBy(F.col("dst").alias("n"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # every node appears as dst in the symmetrized list, so the modal
        # pick covers all nodes — no keep-own-label left join needed
        labels = (
            freq.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col("n").alias("node"), "lbl")
            .transform(ckpt, eager=True)
        )
    return labels.select("node", F.col("lbl").alias("label"))
