"""Incrementally-maintained aggregate views (IVM) over versioned
ManagedTables — refresh from the CDC change feed, never a base rescan.

The maintained view class is the classically self-maintainable one:

    SELECT g1..gk, count(*) AS _rows, sum(c) AS sum_c ... GROUP BY g1..gk

Counts and sums are distributive: any insert/delete/update delta folds
into the stored state with signed addition (update = delete-pre +
insert-post, so a row that MOVES groups decrements its old group and
increments its new one). min/max are deliberately not offered — they are
not self-maintainable under deletes (a deleted minimum forces a rescan
of its group), which is exactly the line the IVM literature draws.

Refresh cost is O(|delta| + |view|): the change feed between the synced
and current base versions (ManagedTable.changes — one key-shuffle over
the two snapshots, hard-linked versions so unchanged files are shared)
is aggregated to per-group deltas and full-outer-merged into the stored
view. The base table's SIZE never enters the cost — at 100 TB with a
million-row daily delta and a thousand-group view, refresh touches
megabytes. Groups whose count reaches zero drop out, matching GROUP BY
over the final state exactly.

Float caveat (same one the daily-rollup query hit): incremental merge
adds partial sums in a different order than a full re-aggregation, so
float sum columns can drift in the last ulp. Callers who need
bit-stable equality with a full re-agg should sum exact-integer
(micro-unit) columns — the registry query does.

No analog in the reference (no versioning, no views: src/planner/
mod.rs:21-38 plans only basic CRUD); this extends its CRUD tier the
same way the CDC feed does.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mesin_spark.dml import CatalogError, DdlSession, ManagedTable

_STATE_SUFFIX = "._MV_STATE.json"


def _state_path(mv: ManagedTable) -> str:
    # OUTSIDE the table dir: the flat-layout _swap_in replaces the whole
    # directory, which would silently drop a state file stored inside it
    return mv.path.rstrip("/") + _STATE_SUFFIX


def _save_state(mv: ManagedTable, state: dict) -> None:
    path = _state_path(mv)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, path)  # atomic on POSIX — readers see old or new


def _load_state(mv: ManagedTable) -> dict:
    with open(_state_path(mv)) as f:
        return json.load(f)


@dataclass
class RefreshStats:
    """What a refresh did — the audit record a pipeline logs."""

    from_version: int
    to_version: int
    delta_rows: int
    groups_touched: int

    @property
    def applied(self) -> bool:
        return self.to_version > self.from_version


class AggView:
    """Handle to a materialized aggregate view created by
    ``create_agg_view``; reopenable via ``open_agg_view``."""

    def __init__(
        self,
        base: ManagedTable,
        mv: ManagedTable,
        key_cols: list[str],
        group_cols: list[str],
        sum_cols: list[str],
    ):
        self.base = base
        self.mv = mv
        self.key_cols = key_cols
        self.group_cols = group_cols
        self.sum_cols = sum_cols

    def df(self) -> DataFrame:
        return self.mv.df()

    def synced_version(self) -> int:
        return int(_load_state(self.mv)["synced_version"])

    def refresh(self) -> RefreshStats:
        """Fold base-table changes since the last sync into the view.

        One change-feed join + one small-group aggregate + one
        full-outer merge against the stored view — no base rescan. The
        merge keys on the group columns; untouched groups pass through
        with null deltas. A no-op when the base hasn't advanced."""
        cur = self.base.current_version()
        if cur is None:
            raise CatalogError("AggView requires a versioned base table")
        synced = self.synced_version()
        if cur <= synced:
            return RefreshStats(synced, synced, 0, 0)
        delta = self.base.changes(synced, cur, key_cols=self.key_cols)
        sign = F.when(
            F.col("change_type").isin("insert", "update_post"), F.lit(1)
        ).otherwise(F.lit(-1))
        dagg = (
            delta.withColumn("_sg", sign)
            .groupBy(*self.group_cols)
            .agg(
                F.sum("_sg").alias("_d_rows"),
                F.count(F.lit(1)).alias("_d_events"),
                *[
                    F.sum(F.col("_sg") * F.col(c)).alias(f"_d_{c}")
                    for c in self.sum_cols
                ],
            )
        )
        # the delta aggregate is view-sized or smaller; materialize it
        # once for the stats AND the merge (changes() joins two snapshot
        # reads — recomputing it inside the merge would double that work)
        dagg = dagg.localCheckpoint(eager=True)
        touched = dagg.count()
        delta_rows = (
            dagg.agg(F.sum("_d_events").alias("n")).collect()[0]["n"] or 0
        )
        merged = self.mv.df().join(dagg, self.group_cols, "full_outer")
        new_rows = F.coalesce(F.col("_rows"), F.lit(0)) + F.coalesce(
            F.col("_d_rows"), F.lit(0)
        )
        sums = [
            (
                F.coalesce(F.col(f"sum_{c}"), F.lit(0))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
            ).alias(f"sum_{c}")
            for c in self.sum_cols
        ]
        new_mv = (
            merged.select(
                *self.group_cols, new_rows.alias("_rows"), *sums
            ).filter(F.col("_rows") > 0)
        )
        self.mv._swap_in(new_mv)
        _save_state(
            self.mv,
            {
                "synced_version": cur,
                "key_cols": self.key_cols,
                "group_cols": self.group_cols,
                "sum_cols": self.sum_cols,
                "base_path": self.base.path,
                "base_name": self.base.name,
            },
        )
        return RefreshStats(synced, cur, int(delta_rows), int(touched))


def maintain_view_stream(
    stream_df: DataFrame,
    view: AggView,
    shuffle_partitions: int = 8,
) -> list[RefreshStats]:
    """Streaming materialized-view maintenance: foreachBatch appends each
    micro-batch to the view's BASE table (one commit per batch — the
    hard-linked versioned append) and immediately folds that commit into
    the view. The view is fresh within one trigger of the data and each
    fold costs O(|batch| + |view|) — the streaming shape of the same IVM
    contract, sibling of streaming.run_upsert_to_table and
    sketches.maintain_kmv_stream. Returns the per-batch refresh stats.

    Replayed/duplicate micro-batches are NOT deduplicated here (append
    is not idempotent); an exactly-once deployment keys the base on an
    event id and routes through the upsert sink instead."""
    import tempfile

    spark = stream_df.sparkSession
    cols = view.base.df().columns
    stats: list[RefreshStats] = []

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        view.base._append(batch_df.select(*cols))
        stats.append(view.refresh())

    checkpoint = tempfile.mkdtemp(prefix="mesin_mv_ckpt_")
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            stream_df.writeStream.outputMode("append")
            .foreachBatch(apply_batch)
            .option("checkpointLocation", checkpoint)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    return stats


def create_agg_view(
    sess: DdlSession,
    name: str,
    base: ManagedTable,
    key_cols: list[str],
    group_cols: list[str],
    sum_cols: list[str],
) -> AggView:
    """Materialize ``SELECT group_cols, count(*) AS _rows,
    sum(c) AS sum_c... FROM base GROUP BY group_cols`` as a managed
    table and record the base version it reflects. The base must be
    versioned (``enable_versioning``) — the refresh contract is defined
    in terms of its commit history."""
    cur = base.current_version()
    if cur is None:
        raise CatalogError(
            f"base table {base.name!r} must be versioned for an AggView "
            "(call enable_versioning() first)"
        )
    bad = [c for c in sum_cols if c in group_cols]
    if bad:
        raise CatalogError(f"sum_cols overlap group_cols: {bad}")
    # the view adds _rows plus sum_<c> columns, and refresh adds _d_rows /
    # _d_events / _d_<c> deltas — reject specs whose columns would collide
    # with those aliases instead of silently producing ambiguous frames
    reserved = {"_rows", "rows", "events", "_sg"}
    reserved |= {f"sum_{c}" for c in sum_cols}
    clash = [c for c in (*group_cols, *sum_cols) if c in reserved]
    if clash:
        raise CatalogError(
            f"column names collide with view-internal aliases: {clash}"
        )
    agg = base.df().groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_rows"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
    )
    mv = sess.create_table_as(name, agg)
    _save_state(
        mv,
        {
            "synced_version": cur,
            "key_cols": key_cols,
            "group_cols": group_cols,
            "sum_cols": sum_cols,
            "base_path": base.path,
            "base_name": base.name,
        },
    )
    return AggView(base, mv, key_cols, group_cols, sum_cols)


def open_agg_view_by_name(sess: DdlSession, name: str) -> AggView:
    """Reopen a view from its sidecar alone — the base table is
    reconstructed from the recorded path (the resolution rule behind
    ``REFRESH MATERIALIZED VIEW <name>``, which names no base)."""
    mv = sess.table(name)
    st = _load_state(mv)
    base = ManagedTable(sess.spark, st.get("base_name", "base"), st["base_path"])
    return AggView(base, mv, st["key_cols"], st["group_cols"], st["sum_cols"])


def open_agg_view(sess: DdlSession, name: str, base: ManagedTable) -> AggView:
    """Reopen a persisted view from its state sidecar (a new session can
    keep maintaining a view it didn't create)."""
    mv = sess.table(name)
    st = _load_state(mv)
    if os.path.realpath(st["base_path"]) != os.path.realpath(base.path):
        raise CatalogError(
            f"view {name!r} was built over {st['base_path']!r}, not "
            f"{base.path!r}"
        )
    return AggView(
        base, mv, st["key_cols"], st["group_cols"], st["sum_cols"]
    )
