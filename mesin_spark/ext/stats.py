"""Multi-column table statistics with mergeable summaries and a
selectivity estimator — the optimizer-support tier layered over the
file-level zone map (sources.zone_map).

Reference parity: the reference keeps NO statistics at all (its catalog
is name → column list, src/context.rs:17-34); this module is part of the
charter extension surface (SURVEY.md §7.4 candidate #4). The design is
the classic cost-based-optimizer stats shape (per-column NDV + equi-width
histogram + quantile summary), computed Spark-first:

- one distributed aggregate pass per table (partial/final HashAggregate,
  no driver funnel, no collect on data paths);
- NDV via ``approx_count_distinct`` (HLL++ — mergeable across partitions
  and across incremental stat builds);
- quantiles via ``percentile_approx`` (Greenwald-Khanna summary — also a
  mergeable partial aggregate, the scale path) with exact ``percentile``
  available for oracle-checked correctness queries;
- histograms as width-bucket floor division + groupBy — pure codegen'd
  arithmetic, one shuffle of at most ``n_bins`` rows per column.

The stats artifact is metadata-sized (rows = columns × bins), so it
persists as a tiny parquet and broadcasts; ``estimate_selectivity`` then
runs driver-side on that bounded artifact exactly like a real optimizer
reading its catalog cache — this is NOT a collect-on-data anti-pattern.
"""

from __future__ import annotations

import math
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_PROBS = (0.25, 0.5, 0.75)


def column_summary(
    df: DataFrame,
    cols: list[str],
    probs: tuple[float, ...] = DEFAULT_PROBS,
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """One row per numeric column: count / nulls / ndv / min / max /
    quantile summary. ``exact=True`` switches countDistinct+percentile
    in for the oracle-checked correctness path; the default approximate
    path is the mergeable 100 TB path (HLL++ + GK summary, both
    partial/final aggregates)."""
    prob_arr = F.array(*[F.lit(p) for p in probs])
    # ONE aggregate over the table for ALL columns (a union of per-column
    # aggs would scan once per column — Catalyst does not merge scans
    # across union branches); the wide single row explodes back to one
    # row per column in-plan, so no collect happens here
    aggs = []
    for i, c in enumerate(cols):
        x = F.col(c).cast("double")
        if exact:
            ndv = F.countDistinct(c)
            qs = F.percentile(x, prob_arr)
        else:
            ndv = F.approx_count_distinct(c)
            qs = F.percentile_approx(x, prob_arr, F.lit(accuracy))
        aggs.append(
            F.struct(
                F.lit(c).alias("col"),
                F.count(F.lit(1)).alias("n"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
                ndv.alias("ndv"),
                F.min(x).alias("min_v"),
                F.max(x).alias("max_v"),
                qs.alias("quantiles"),
            ).alias(f"_c{i}")
        )
    wide = df.agg(*aggs)
    return wide.select(
        F.explode(F.array(*[F.col(f"_c{i}") for i in range(len(cols))])).alias("s")
    ).select("s.*")


def equi_width_histogram(
    df: DataFrame, col: str, lo: float, hi: float, n_bins: int = 32
) -> DataFrame:
    """Equi-width histogram over [lo, hi]: bin index by floor division
    (map-side arithmetic), then ONE groupBy shuffle of ≤ n_bins+1 keys.
    Values outside the range clamp to the edge bins, nulls are dropped —
    matching the CBO convention (null fraction is tracked separately in
    column_summary)."""
    if hi <= lo:
        # degenerate single-point column: everything lands in bin 0
        bin_c = F.lit(0)
        width = 1.0
    else:
        width = (hi - lo) / n_bins
        raw = F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width))
        bin_c = F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), raw)).cast("int")
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bin_c.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit(col).alias("col"),
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("bin_hi"),
            "n",
        )
    )


@dataclass
class TableStats:
    """Loaded statistics artifact: {col -> summary row dict} plus
    {col -> sorted histogram rows}. Metadata-sized; lives driver-side
    like an optimizer's catalog cache."""

    summary: dict
    histograms: dict

    def row(self, col: str) -> dict:
        return self.summary[col]


def build_stats(
    df: DataFrame,
    cols: list[str],
    n_bins: int = 32,
    accuracy: int = 10000,
    bounds: dict | None = None,
) -> TableStats:
    """Compute summary + histograms for ``cols``. Two passes over the
    table (min/max must exist before the fixed-width bucketing); each
    pass is a plain distributed aggregate. The collected results are
    metadata (cols × bins rows), not data.

    ``bounds`` ({col: (lo, hi)}) pins histogram bucket edges to a KNOWN
    domain instead of the observed min/max — required for incremental /
    streaming maintenance, where every batch must bucket identically for
    merge_stats to add bins rather than drop them."""
    summ = {r["col"]: r.asDict() for r in column_summary(df, cols, accuracy=accuracy).collect()}
    hists = {}
    for c in cols:
        if bounds and c in bounds:
            lo, hi = bounds[c]
        else:
            lo, hi = summ[c]["min_v"], summ[c]["max_v"]
        if lo is None:
            hists[c] = []
            continue
        rows = equi_width_histogram(df, c, lo, hi, n_bins).collect()
        hists[c] = sorted((r.asDict() for r in rows), key=lambda r: r["bin"])
    return TableStats(summary=summ, histograms=hists)


def write_stats(
    stats: TableStats, spark: SparkSession, path: str, batch_id: int | None = None
) -> None:
    """Persist the artifact as two tiny parquet files (summary rows +
    histogram rows) under ``path`` — the shape a 100 TB deployment keeps
    in its table-format commit log / stats store. Written driver-side
    with pyarrow: the artifact is catalog metadata (cols × bins rows),
    and a distributed write would spend a whole Spark job's scheduling
    overhead on kilobytes — measured 10-30× slower than the direct
    serialize. The files are plain parquet, readable by any engine.

    Atomicity: the PAIR commits as one unit. Both files (plus a meta.json
    carrying ``batch_id`` for streaming replay detection) are written into
    a staging directory, renamed to an immutable ``snap-<n>`` directory,
    and published by an os.replace of the ``_CURRENT`` pointer file — a
    crash at any point leaves readers on the complete previous snapshot,
    never a (new hist, old summary) torn pair that merge_stats would
    double-count on checkpoint replay."""
    srows = [
        {
            "col": c,
            "n": int(r["n"]),
            "n_null": int(r["n_null"]),
            "ndv": int(r["ndv"]),
            "min_v": float(r["min_v"]) if r["min_v"] is not None else None,
            "max_v": float(r["max_v"]) if r["max_v"] is not None else None,
            "quantiles": [float(q) for q in (r["quantiles"] or [])],
        }
        for c, r in stats.summary.items()
    ]
    hrows = [
        {
            "col": h["col"],
            "bin": int(h["bin"]),
            "bin_lo": float(h["bin_lo"]),
            "bin_hi": float(h["bin_hi"]),
            "n": int(h["n"]),
        }
        for hs in stats.histograms.values()
        for h in hs
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    schema_s = pa.schema(
        [
            ("col", pa.string()),
            ("n", pa.int64()),
            ("n_null", pa.int64()),
            ("ndv", pa.int64()),
            ("min_v", pa.float64()),
            ("max_v", pa.float64()),
            ("quantiles", pa.list_(pa.float64())),
        ]
    )
    schema_h = pa.schema(
        [
            ("col", pa.string()),
            ("bin", pa.int32()),
            ("bin_lo", pa.float64()),
            ("bin_hi", pa.float64()),
            ("n", pa.int64()),
        ]
    )
    import json
    import uuid

    staging = os.path.join(path, f".staging-{uuid.uuid4().hex}")
    os.makedirs(staging)
    pq.write_table(pa.Table.from_pylist(srows, schema=schema_s),
                   os.path.join(staging, "summary.parquet"))
    pq.write_table(pa.Table.from_pylist(hrows, schema=schema_h),
                   os.path.join(staging, "hist.parquet"))
    with open(os.path.join(staging, "meta.json"), "w") as f:
        json.dump({"batch_id": batch_id}, f)
    snap_n = 1 + max(
        (int(d[5:]) for d in os.listdir(path)
         if d.startswith("snap-") and d[5:].isdigit()),
        default=0,
    )
    snap = os.path.join(path, f"snap-{snap_n}")
    os.rename(staging, snap)  # atomic: target never pre-exists
    tmp_ptr = os.path.join(path, f".ptr-{uuid.uuid4().hex}")
    with open(tmp_ptr, "w") as f:
        f.write(f"snap-{snap_n}")
    os.replace(tmp_ptr, os.path.join(path, "_CURRENT"))  # the commit point
    # prune superseded snapshots + pre-snapshot flat files (best-effort;
    # a concurrent reader that already resolved _CURRENT holds its files
    # open — POSIX keeps them readable until close)
    for d in os.listdir(path):
        full = os.path.join(path, d)
        if d.startswith("snap-") and d != f"snap-{snap_n}":
            shutil.rmtree(full, ignore_errors=True)
        elif d in ("summary.parquet", "hist.parquet"):
            try:
                os.remove(full)
            except OSError:
                pass


def _stats_snapshot_dir(path: str) -> str | None:
    """Resolve the committed snapshot directory, or the legacy flat layout
    (pre-round-3 artifacts: summary/hist directly under ``path``), or None
    when no committed artifact exists."""
    cur = os.path.join(path, "_CURRENT")
    if os.path.exists(cur):
        with open(cur) as f:
            return os.path.join(path, f.read().strip())
    if os.path.exists(os.path.join(path, "summary.parquet")):
        return path
    return None


def stats_exist(path: str) -> bool:
    """True when a committed stats artifact exists at ``path``."""
    return _stats_snapshot_dir(path) is not None


def stats_batch_id(path: str) -> int | None:
    """The ``batch_id`` the committed snapshot was written with (None for
    batch-mode or legacy artifacts) — the streaming replay-detection hook."""
    import json

    snap = _stats_snapshot_dir(path)
    if snap is None:
        return None
    meta = os.path.join(snap, "meta.json")
    if not os.path.exists(meta):
        return None
    with open(meta) as f:
        return json.load(f).get("batch_id")


def load_stats(spark: SparkSession, path: str) -> TableStats:
    """Reload a persisted artifact (pyarrow, driver-side — metadata scale;
    ``spark`` kept in the signature so callers treat this as the engine's
    catalog API and the files stay readable via spark.read.parquet too).
    Reads through the ``_CURRENT`` snapshot pointer (write_stats' commit
    point); legacy flat artifacts load unchanged."""
    import pyarrow.parquet as pq

    snap = _stats_snapshot_dir(path)
    if snap is None:
        raise FileNotFoundError(f"no committed stats artifact at {path}")
    summ = {
        r["col"]: r
        for r in pq.read_table(os.path.join(snap, "summary.parquet")).to_pylist()
    }
    hists: dict = {c: [] for c in summ}
    for r in pq.read_table(os.path.join(snap, "hist.parquet")).to_pylist():
        hists.setdefault(r["col"], []).append(r)
    for c in hists:
        hists[c].sort(key=lambda x: x["bin"])
    return TableStats(summary=summ, histograms=hists)


def estimate_selectivity(stats: TableStats, col: str, op: str, value: float) -> float:
    """Histogram-based selectivity of ``col <op> value`` — the estimate a
    CBO derives before choosing join order / broadcast side. Uniform
    interpolation inside the containing bucket; ``=`` falls back to
    bucket-density / ndv. Returns a fraction of NON-NULL rows in [0,1]."""
    row = stats.row(col)
    n = row["n"] - row["n_null"]
    if n <= 0:
        return 0.0
    hist = stats.histograms.get(col) or []
    if not hist:
        return 0.0

    def frac_below(v: float) -> float:
        acc = 0.0
        for h in hist:
            if v >= h["bin_hi"]:
                acc += h["n"]
            elif v > h["bin_lo"]:
                width = h["bin_hi"] - h["bin_lo"]
                part = (v - h["bin_lo"]) / width if width > 0 else 1.0
                acc += h["n"] * part
        return acc / n

    if op in ("<", "<="):
        return min(1.0, frac_below(value))
    if op in (">", ">="):
        return min(1.0, 1.0 - frac_below(value))
    if op == "=":
        ndv = max(1, row["ndv"])
        for h in hist:
            if h["bin_lo"] <= value < h["bin_hi"] or (
                value == h["bin_hi"] and h is hist[-1]
            ):
                # assume values uniform within the bucket: bucket mass
                # split over the distinct values expected to land there
                bucket_ndv = max(1.0, ndv * h["n"] / n) if n else 1.0
                return min(1.0, (h["n"] / n) / bucket_ndv)
        return 0.0
    raise ValueError(f"unsupported op: {op}")


def estimate_range(stats: TableStats, col: str, lo: float, hi: float) -> float:
    """Selectivity of ``lo <= col <= hi`` (BETWEEN)."""
    below_hi = estimate_selectivity(stats, col, "<=", hi)
    below_lo = estimate_selectivity(stats, col, "<", lo)
    return max(0.0, below_hi - below_lo)


def ndv_error_bound(rsd: float = 0.05) -> float:
    """Relative standard error of the artifact's NDV estimate — equal to
    the relativeSD approx_count_distinct ran with; column_summary uses
    Spark's DEFAULT 0.05 (≈ 1.04/sqrt(433) registers), so that is the
    honest default here. Exposed so callers gating a broadcast on NDV
    know the estimate can be ±5%, not the ±0.8% a 2^14-register sketch
    would give."""
    return rsd


def estimate_filtered_rows(
    stats: TableStats, col: str, op: str, value: float
) -> int:
    """Estimated surviving cardinality of ``col <op> value`` — selectivity
    × non-null rows (CBO output row estimate for a Filter node)."""
    row = stats.row(col)
    n = row["n"] - row["n_null"]
    return int(n * estimate_selectivity(stats, col, op, value))


def avg_row_bytes(df: DataFrame) -> int:
    """Static per-row byte estimate from the schema (fixed-width types at
    their width, strings/binary/arrays at a 20-byte default — the same
    defaultSize convention Catalyst's statistics use). Schema-only: no
    scan, no sampling."""
    fixed = {
        "boolean": 1, "byte": 1, "short": 2, "int": 4, "date": 4,
        "long": 8, "float": 4, "double": 8, "timestamp": 8,
        "timestamp_ntz": 8,
    }
    total = 0
    for f in df.schema.fields:
        total += fixed.get(f.dataType.typeName(), 20)
    return max(1, total)


def broadcast_if_small(
    df: DataFrame,
    stats: TableStats,
    pred: tuple[str, str, float] | None = None,
    threshold_bytes: int = 10 * 1024 * 1024,
):
    """The stats→plan hook a CBO applies to a join side: estimate the
    side's POST-FILTER size from the persisted statistics artifact and
    return ``F.broadcast(df)`` when it fits under the broadcast
    threshold, else ``df`` unchanged (shuffle join). This decides from
    metadata alone — no scan, no AQE runtime feedback needed — which is
    exactly how a filtered dimension that LOOKS big at the catalog level
    but shrinks under its predicate gets broadcast on the first run
    (AQE only learns sizes after a shuffle stage materializes)."""
    if pred is None:
        any_col = next(iter(stats.summary))
        n_rows = stats.row(any_col)["n"]
    else:
        n_rows = estimate_filtered_rows(stats, *pred)
    est_bytes = n_rows * avg_row_bytes(df)
    return F.broadcast(df) if est_bytes <= threshold_bytes else df


def _bucketing_of(hist: list) -> tuple | None:
    """(width, origin) of an equi-width histogram's bucket grid, derived
    from any one bin — bins are sparse (only non-empty bins exist), so
    compatibility must be judged on the GRID, never on list length or
    first/last entries."""
    if not hist:
        return None
    h = hist[0]
    width = h["bin_hi"] - h["bin_lo"]
    if width <= 0:
        return None
    return (width, h["bin_lo"] - h["bin"] * width)


def merge_stats(a: TableStats, b: TableStats) -> TableStats:
    """Merge two stats artifacts built over DISJOINT row sets (e.g. the
    existing corpus and an arriving ingest batch) without rescanning
    either: counts/nulls add, min/max combine, histograms merge BY BIN
    ID when both sides share the same bucket grid (width + origin —
    guaranteed when both builds pinned the same ``bounds``; histograms
    are sparse, so absent bins count as zero). Incompatible grids drop
    the histogram (callers re-profile). NDV and quantiles are NOT
    exactly mergeable from finished numbers — NDV reports the SUM, a
    documented upper bound (exact only when the key sets are disjoint;
    no range-based cap, which would be invalid for continuous columns)
    — and quantiles are dropped; deployments needing mergeable
    NDV/quantiles keep the underlying HLL/GK partials, which Spark's
    hll_union_agg / percentile_approx re-aggregation already covers
    (see q_hll_rollup)."""
    summary = {}
    hists = {}
    for c in set(a.summary) | set(b.summary):
        if c not in a.summary or c not in b.summary:
            src = a if c in a.summary else b
            summary[c] = dict(src.summary[c])
            hists[c] = [dict(h) for h in src.histograms.get(c, [])]
            continue
        ra, rb = a.summary[c], b.summary[c]
        mins = [v for v in (ra["min_v"], rb["min_v"]) if v is not None]
        maxs = [v for v in (ra["max_v"], rb["max_v"]) if v is not None]
        lo = min(mins) if mins else None
        hi = max(maxs) if maxs else None
        summary[c] = {
            "col": c,
            "n": ra["n"] + rb["n"],
            "n_null": ra["n_null"] + rb["n_null"],
            "ndv": ra["ndv"] + rb["ndv"],  # upper bound; exact iff disjoint keys
            "min_v": lo,
            "max_v": hi,
            "quantiles": None,
        }
        ha, hb = a.histograms.get(c, []), b.histograms.get(c, [])
        if not ha or not hb:
            # an all-null (or empty) batch contributes no bins — keep the
            # populated side rather than wiping the accumulated histogram
            hists[c] = [dict(h) for h in (ha or hb)]
            continue
        ga, gb = _bucketing_of(ha), _bucketing_of(hb)
        grids_match = (
            ga is not None
            and gb is not None
            and abs(ga[0] - gb[0]) <= 1e-9 * max(1.0, abs(ga[0]))
            and abs(ga[1] - gb[1]) <= 1e-9 * max(1.0, abs(ga[0]))
        )
        if grids_match:
            by_bin: dict = {}
            for h in ha:
                by_bin[h["bin"]] = dict(h)
            for h in hb:
                if h["bin"] in by_bin:
                    by_bin[h["bin"]]["n"] += h["n"]
                else:
                    by_bin[h["bin"]] = dict(h)
            hists[c] = [by_bin[k] for k in sorted(by_bin)]
        else:
            hists[c] = []
    return TableStats(summary=summary, histograms=hists)


def estimate_side_rows(side: dict) -> int:
    """Estimated post-filter cardinality of one join side described as
    {"df", "stats", "pred"} (pred = (col, op, value) or None)."""
    stats: TableStats = side["stats"]
    if side.get("pred") is None:
        any_col = next(iter(stats.summary))
        return int(stats.row(any_col)["n"])
    return estimate_filtered_rows(stats, *side["pred"])


def order_sides_by_stats(sides: list[dict]) -> list[int]:
    """Greedy join-order heuristic a CBO applies to a star join: attach
    the most selective dimension FIRST so the fact stream shrinks before
    the wider joins run. Returns the index permutation (ascending
    estimated rows, input order as tie-break — deterministic). Pure
    function over metadata; separately testable from the plan it
    drives."""
    return sorted(range(len(sides)), key=lambda i: (estimate_side_rows(sides[i]), i))


def join_by_stats(
    fact: DataFrame,
    sides: list[dict],
    threshold_bytes: int = 10 * 1024 * 1024,
) -> DataFrame:
    """Stats-driven star join: each side of {"df", "stats", "pred",
    "on"} is (a) ordered by estimated post-filter cardinality
    (order_sides_by_stats) and (b) broadcast when its estimated bytes
    fit (broadcast_if_small) — the two decisions a cost-based optimizer
    makes from catalog statistics before the first byte is scanned.
    ``pred`` only feeds the estimate; callers apply the actual filter to
    ``df`` themselves (keeping estimate and plan visibly separate)."""
    out = fact
    for i in order_sides_by_stats(sides):
        s = sides[i]
        side_df = broadcast_if_small(
            s["df"], s["stats"], pred=s.get("pred"), threshold_bytes=threshold_bytes
        )
        out = out.join(side_df, s["on"])
    return out


def estimate_conjunction(
    stats: TableStats, preds: list[tuple[str, str, float]]
) -> float:
    """Selectivity of an AND of single-column predicates under the
    attribute-independence assumption (the textbook CBO default):
    product of per-predicate selectivities, with same-column range pairs
    (>= lo AND <= hi patterns) collapsed through estimate_range first so
    the common BETWEEN shape doesn't get squared away. Correlated
    columns make this an over- or under-estimate — the documented CBO
    failure mode; sampled-correlation correction is the future tier."""
    by_col: dict = {}
    for p in preds:
        by_col.setdefault(p[0], []).append(p)
    sel = 1.0
    for col, ps in by_col.items():
        los = [(op, v) for (_, op, v) in ps if op in (">", ">=")]
        his = [(op, v) for (_, op, v) in ps if op in ("<", "<=")]
        rest = [p for p in ps if p[1] not in ("<", "<=", ">", ">=")]
        # collapse ALL range predicates on one column to the binding pair
        # (x>5 AND x>10 is x>10, not the squared product)
        if los and his:
            sel *= estimate_range(stats, col, max(v for _, v in los), min(v for _, v in his))
        elif los:
            op, v = max(los, key=lambda t: t[1])
            sel *= estimate_selectivity(stats, col, op, v)
        elif his:
            op, v = min(his, key=lambda t: t[1])
            sel *= estimate_selectivity(stats, col, op, v)
        for _, op, v in rest:
            sel *= estimate_selectivity(stats, col, op, v)
    return max(0.0, min(1.0, sel))


def recommend_shuffle_partitions(
    est_rows: int,
    row_bytes: int,
    target_partition_bytes: int = 64 * 1024 * 1024,
    min_partitions: int = 1,
    max_partitions: int = 100000,
) -> int:
    """Seed ``spark.sql.shuffle.partitions`` for a query from its
    ESTIMATED shuffle volume instead of the static session value: AQE
    can only coalesce DOWN from the configured number, so a 100-row
    grouped aggregate pays 200 empty-partition tasks under a
    cluster-sized default, while a 10 TB join under a small default
    serializes. estimate → rows × row_bytes / target, clamped. Apply
    with spark.conf.set before the action (per-query, AQE refines the
    rest)."""
    est_bytes = max(0, est_rows) * max(1, row_bytes)
    n = -(-est_bytes // target_partition_bytes)  # ceil
    return int(max(min_partitions, min(max_partitions, n)))


def maintain_stats_stream(
    stream_df: DataFrame,
    cols: list[str],
    stats_path: str,
    checkpoint: str,
    n_bins: int = 32,
    bounds: dict | None = None,
):
    """Streaming statistics maintenance: a ``foreachBatch`` sink that
    builds stats over each micro-batch and merge_stats-es them into the
    persisted artifact, so the optimizer's view of an append-only table
    stays fresh WITHOUT ever rescanning the corpus — each batch is
    scanned exactly once, on arrival. ``bounds`` should pin the known
    column domains so every batch buckets identically (mergeable bins);
    unpinned columns keep summary-only maintenance.

    Exactly-once: write_stats commits the (summary, hist, batch_id)
    triple atomically behind its snapshot pointer, and a replayed batch
    (crash after the commit but before the checkpoint recorded it) is
    detected by comparing the committed batch_id and SKIPPED — the merge
    is not idempotent, so replay detection, not the checkpoint alone, is
    what prevents double-counting. The artifact directory and checkpoint
    must still be dropped together.

    Returns the DataStreamWriter — caller picks the trigger
    (`.trigger(availableNow=True)` to drain, or processingTime for
    continuous ingest)."""

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if stats_exist(stats_path):
            if stats_batch_id(stats_path) == batch_id:
                return  # checkpoint replay of an already-committed batch
            batch_stats = merge_stats(
                load_stats(spark, stats_path),
                build_stats(batch_df, cols, n_bins=n_bins, bounds=bounds),
            )
        else:
            batch_stats = build_stats(batch_df, cols, n_bins=n_bins, bounds=bounds)
        write_stats(batch_stats, spark, stats_path, batch_id=batch_id)

    return (
        stream_df.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def equi_depth_histogram(
    df: DataFrame, col: str, n_bins: int = 32, exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Equi-DEPTH histogram: bucket edges at the column's own quantiles,
    so every bucket holds ~n/n_bins rows however skewed the values.
    Equi-width bins under-resolve skew (one bucket swallows the mass and
    interpolation inside it is blind); depth-balanced edges bound the
    per-bucket estimation error by construction — the histogram form
    real CBOs default to. Edges come from one percentile aggregate
    (mergeable GK summary unless ``exact``); bucketing is a small fold
    over the ≤n_bins+1 edge array (codegen'd, map-side) + one ≤n_bins-key
    shuffle. Duplicate edges (a single value holding >1/n_bins of the
    mass) merge into one wider bucket."""
    probs = [i / n_bins for i in range(n_bins + 1)]
    prob_arr = F.array(*[F.lit(p) for p in probs])
    x = F.col(col).cast("double")
    if exact:
        qcol = F.percentile(x, prob_arr)
    else:
        qcol = F.percentile_approx(x, prob_arr, F.lit(accuracy))
    q = df.agg(qcol.alias("q")).collect()[0]["q"]
    if q is None:
        # empty frame or all-null column: no quantiles exist — return an
        # empty histogram (equi-width's convention), never a TypeError
        return df.sparkSession.createDataFrame(
            [], "col STRING, bin INT, bin_lo DOUBLE, bin_hi DOUBLE, n BIGINT"
        )
    edges = [float(e) for e in q]
    # collapse duplicate edges; keep ends
    uniq = [edges[0]]
    for e in edges[1:]:
        if e > uniq[-1]:
            uniq.append(e)
    if len(uniq) < 2:
        uniq = [uniq[0], uniq[0] + 1.0]
    inner = uniq[1:-1]  # values above edge i → bin i+1, clamped below
    edge_arr = F.array(*[F.lit(e) for e in inner])
    bin_c = F.aggregate(
        edge_arr, F.lit(0), lambda acc, e: acc + F.when(x > e, 1).otherwise(0)
    )
    bounds = list(zip(uniq[:-1], uniq[1:]))
    lo_arr = F.array(*[F.lit(b[0]) for b in bounds])
    hi_arr = F.array(*[F.lit(b[1]) for b in bounds])
    return (
        df.filter(x.isNotNull())
        .groupBy(bin_c.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit(col).alias("col"),
            "bin",
            F.element_at(lo_arr, F.col("bin") + 1).alias("bin_lo"),
            F.element_at(hi_arr, F.col("bin") + 1).alias("bin_hi"),
            "n",
        )
    )


def build_stats_depth(
    df: DataFrame, cols: list[str], n_bins: int = 32, accuracy: int = 10000
) -> TableStats:
    """build_stats with equi-DEPTH histograms — same artifact shape, the
    estimator interpolates over arbitrary [bin_lo, bin_hi) rows, so
    everything downstream (persist, selectivity, join planning) works
    unchanged; use for skewed columns."""
    summ = {
        r["col"]: r.asDict()
        for r in column_summary(df, cols, accuracy=accuracy).collect()
    }
    hists = {}
    for c in cols:
        if summ[c]["min_v"] is None:
            hists[c] = []
            continue
        rows = equi_depth_histogram(df, c, n_bins, accuracy=accuracy).collect()
        hists[c] = sorted((r.asDict() for r in rows), key=lambda r: r["bin"])
    return TableStats(summary=summ, histograms=hists)


def measured_conjunction(
    df: DataFrame,
    preds: list[tuple[str, str, float]],
    key_col: str,
    sample_mod: int = 64,
) -> float:
    """Joint selectivity of an AND measured on a deterministic
    1/sample_mod hash-sample — the correction for what the independence
    product (estimate_conjunction) cannot see: correlated columns. The
    sample key must be a column INDEPENDENT of the predicates (a row
    id); sampling on the predicate columns themselves would bias the
    measurement. One filtered conditional aggregate over the pruned
    predicate columns — at 100 TB the scan touches only those columns
    and the sample predicate is codegen'd, so this costs a fraction of
    a full-table count and is reproducible run to run (no rand())."""
    cond = None
    for c, op, v in preds:
        p = F.expr(f"{c} {op} {v}")
        cond = p if cond is None else (cond & p)
    row = (
        df.filter(F.pmod(F.xxhash64(F.col(key_col)), F.lit(sample_mod)) == 0)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(cond, 1).otherwise(0)).alias("hits"),
        )
        .collect()[0]
    )
    return (row["hits"] / row["n"]) if row["n"] else 0.0
