"""Structured Streaming tier (SURVEY.md §2.10 — absent in the reference;
charter extension).

The batch event-time window queries in mesin_spark/queries/events.py use
groupBy(F.window(...)) expressions that run unchanged under readStream —
these helpers wire the streaming side: file-source readStream, watermarks
for late data, windowed aggregation, watermark-scoped dedup, and a custom
stateful operator via applyInPandasWithState.

Local testing drives a parquet directory through the file source with a
memory sink and processAllAvailable() (synchronous completion); on a real
cluster the same pipelines run against Kafka/file sources with checkpoint
dirs — only the source/sink lines change.
"""

from __future__ import annotations

import tempfile
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mesin_spark.functions import stable_round as R


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source readStream over the events table (schema pinned from a
    batch read — streaming sources never infer).

    The ts column normalizes to TIMESTAMP (LTZ) whatever the file stores:

    - parquet TIMESTAMP(NANOS): read as raw nanos (legacy nanosAsLong
      conf) and div-1000 to µs inside the stream. Unlike the batch reader
      (sources.read_parquet, which saves/restores the conf around the
      one-shot read), a stream consults the conf on every micro-batch file
      read, so it stays set for the stream's lifetime — the documented
      cost of streaming over ns-typed files;
    - parquet µs with isAdjustedToUTC=false: surfaces as TIMESTAMP_NTZ,
      which watermarks/window arithmetic reject against LTZ operands —
      cast (value-preserving under the pinned UTC session timezone).
    """
    from pyspark.sql.types import LongType, TimestampNTZType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file stream source lists a *directory*; glob-filter to the events
    # file so sibling tables in sf_dir aren't swept in
    raw = open_source(
        spark,
        "file",
        path=sf_dir,
        schema=schema,
        path_glob_filter="events.parquet",
    )
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding) window counts with a
    watermark: state for a window is dropped once event time passes
    window_end + watermark — bounded state, the thing that makes this
    viable on an unbounded 100 TB/day stream."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win, "event_type")
        .agg(F.count(F.lit(1)).alias("n"), R(F.sum("value"), 2).alias("total_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-user session windows (gap-based) under a watermark — session
    state merges as events arrive and closes gap past the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("session_start"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Watermark-scoped exact dedup on event_id — state bounded by the
    watermark horizon instead of growing forever."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def drive_stream(
    stream_df: DataFrame,
    configure,
    shuffle_partitions: int = 8,
    checkpoint_prefix: str = "mesin_ckpt_",
) -> list[dict]:
    """THE local stream runner every harness in this package goes
    through: fresh checkpoint dir, shuffle-partition save/drop/restore,
    start → processAllAvailable → stop, and the per-micro-batch progress
    records collected before stop. ``configure`` receives the bare
    DataStreamWriter and returns it with mode/sink/foreachBatch applied.

    Why the partition drop: the stateful-operator partition count is
    fixed at query start by spark.sql.shuffle.partitions; each partition
    is a state-store instance checkpointed every micro-batch, so the
    session default (32) spends most of a local run on empty-store
    bookkeeping. A production deployment keeps the large count (state
    parallelism is exactly what you want on a real cluster)."""
    spark = stream_df.sparkSession
    checkpoint = tempfile.mkdtemp(prefix=checkpoint_prefix)
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            configure(stream_df.writeStream)
            .option("checkpointLocation", checkpoint)
            .start()
        )
        try:
            q.processAllAvailable()
            return [_progress_dict(p) for p in q.recentProgress]
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "append",
    shuffle_partitions: int = 8,
) -> DataFrame:
    """Drive a streaming query to completion against the memory sink and
    return the materialized result (local smoke-test harness over
    drive_stream)."""
    df, _ = run_with_progress(stream_df, name, output_mode, shuffle_partitions)
    return df


def run_with_progress(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "append",
    shuffle_partitions: int = 8,
) -> tuple[DataFrame, list[dict]]:
    """Memory-sink run plus the per-micro-batch progress records Spark's
    StreamingQueryProgress collected while the query ran — the instrument
    for rate/latency measurement (trigger wall-time, input rows, rows/sec
    come from the engine's own metrics, not hand-rolled timers)."""
    progress = drive_stream(
        stream_df,
        lambda w: w.outputMode(output_mode).format("memory").queryName(name),
        shuffle_partitions=shuffle_partitions,
    )
    return stream_df.sparkSession.table(name), progress


def _progress_dict(p) -> dict:
    """Normalize a StreamingQueryProgress to a plain dict across PySpark
    versions (3.x returns dicts already; 4.x returns objects with .json)."""
    import json as _json

    if isinstance(p, dict):
        return p
    raw = p.json() if callable(getattr(p, "json", None)) else p.json
    return _json.loads(raw)


def progress_metrics(progress: list[dict]) -> list[dict]:
    """Flatten progress records into one row per micro-batch:
    (batch_id, input_rows, trigger_ms, add_batch_ms, rows_per_sec,
    state_rows) — trigger_ms is the end-to-end wall time of the trigger
    (the emission latency of that micro-batch), add_batch_ms the execution
    slice of it, state_rows the total rows held in state stores after the
    batch (the number the watermark is supposed to bound)."""
    rows = []
    for p in progress:
        dur = p.get("durationMs") or {}
        state = p.get("stateOperators") or []
        rows.append(
            {
                "batch_id": int(p.get("batchId", -1)),
                "input_rows": int(p.get("numInputRows", 0) or 0),
                "trigger_ms": int(dur.get("triggerExecution", 0) or 0),
                "add_batch_ms": int(dur.get("addBatch", 0) or 0),
                "rows_per_sec": float(p.get("processedRowsPerSecond", 0.0) or 0.0),
                "state_rows": int(sum(int(s.get("numRowsTotal", 0) or 0) for s in state)),
            }
        )
    return rows


def measure_stream_latency(
    spark: SparkSession,
    sf_dir: str,
    n_files: int = 6,
    max_files_per_trigger: int = 2,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> list[dict]:
    """Rate/latency harness: split the events table into ``n_files``
    parquet files, stream them through the windowed aggregation
    ``max_files_per_trigger`` files per trigger (forcing multiple
    micro-batches), and return one metrics row per batch from the
    engine's own progress telemetry (progress_metrics).

    This is the local stand-in for a production latency dashboard: on a
    real cluster the same recentProgress stream feeds a metrics sink via
    StreamingQueryListener; here it lands next to the correctness checks
    so a state-store or watermark regression shows up as a latency cliff
    in the same test run."""
    from mesin_spark.sources import read_parquet

    split_dir = tempfile.mkdtemp(prefix="mesin_stream_rate_")
    events = read_parquet(spark, f"{sf_dir}/events.parquet")
    events.repartition(n_files).write.mode("overwrite").parquet(split_dir)
    raw = open_source(
        spark,
        "file",
        path=split_dir,
        schema=events.schema,
        max_files_per_trigger=max_files_per_trigger,
    )
    agg = windowed_counts(raw, window=window, watermark=watermark)
    _, progress = run_with_progress(agg, "mesin_stream_rate_out", output_mode="append")
    return progress_metrics(progress)


def _purchase_click(
    purchases: DataFrame,
    clicks: DataFrame,
    horizon: str,
    watermark: str,
    how: str,
) -> DataFrame:
    """Shared body of the inner/left stream-stream purchase↔click joins —
    one implementation so the join condition, watermark handling and
    projection can never silently diverge between the two variants."""
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts"))
        & (F.col("c_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {horizon}")),
        how,
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        (F.unix_timestamp("c_ts") - F.unix_timestamp("p_ts")).alias("gap_s"),
    )


def purchase_click_join(
    purchases: DataFrame,
    clicks: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: clicks within ``horizon`` after a purchase
    by the same user. Both sides carry watermarks and the join condition
    bounds event time from both directions, so the state store can expire
    rows — the requirement that makes stream-stream joins viable unbounded.
    Returns (user_id, purchase_id, click_id, gap_s)."""
    return _purchase_click(purchases, clicks, horizon, watermark, "inner")


def enrich_with_static(
    stream: DataFrame, dim: DataFrame, on: str, broadcast: bool = True
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (re-read) static side — no watermark and no state store needed on
    either side, because the static relation is complete at every trigger.
    THE pattern for attaching reference data (user tier, geo,
    model-version routing) to an event stream at scale.

    ``broadcast=True`` (default) hints the dim side — right for the
    dimension-sized tables this is meant for. Pass ``broadcast=False``
    for an unbounded enrichment side (e.g. a billion-row user table):
    the per-batch planner then picks the join strategy itself instead of
    being forced into an OOM-sized broadcast."""
    return stream.join(F.broadcast(dim) if broadcast else dim, on)


# -- source/sink abstraction ----------------------------------------------
#: Source kinds → the Spark readStream format + required options. 'file'
#: and 'rate' execute locally; 'kafka'/'kinesis' need their connector
#: package on the cluster classpath (standard on real deployments) — the
#: interface builds the exact reader so pipelines are written once and
#: only the source line changes between local test and production.
SOURCE_KINDS = ("file", "rate", "kafka")
SINK_KINDS = ("memory", "noop", "file", "kafka", "foreach_batch")


class StreamConfigError(ValueError):
    """Bad source/sink configuration (unknown kind, missing option)."""


#: The schema every Spark kafka source batch/stream carries (fixed by the
#: connector, not by topic contents) — downstream pipelines bind to this:
#: value is BINARY, pair with from_json/from_avro after a cast to string.
KAFKA_SOURCE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def kafka_source_config(**options) -> tuple[str, dict[str, str]]:
    """Resolve the EXACT (format, reader options) pair open_source's kafka
    arm passes to Spark — pure configuration, split from ``.load()`` so an
    environment without the spark-sql-kafka connector on the classpath can
    still contract-test the reader spec it would run with (the load itself
    needs the connector jar; everything up to it is this function)."""
    servers = options.get("bootstrap_servers") or _missing("kafka", "bootstrap_servers")
    conf = {
        "kafka.bootstrap.servers": servers,
        "startingOffsets": options.get("starting_offsets", "latest"),
    }
    if options.get("subscribe"):
        conf["subscribe"] = options["subscribe"]
    elif options.get("assign"):
        conf["assign"] = options["assign"]
    else:
        _missing("kafka", "subscribe (or assign)")
    if options.get("max_offsets_per_trigger"):
        conf["maxOffsetsPerTrigger"] = str(options["max_offsets_per_trigger"])
    return "kafka", conf


def open_source(spark: SparkSession, kind: str, **options) -> DataFrame:
    """Open a streaming source by kind:

    - ``file``: parquet/json/csv directory (options: path, schema,
      format='parquet', max_files_per_trigger) — the local test source and
      the object-store landing-zone source at scale;
    - ``rate``: Spark's built-in load generator (options: rows_per_second)
      — unbounded, runs anywhere, used for soak tests;
    - ``kafka``: options bootstrap_servers + (subscribe | assign); value
      arrives as binary, pair with ``from_json``/``from_avro`` downstream.
      Requires the spark-sql-kafka connector on the classpath.
    """
    if kind == "file":
        path = options.get("path") or _missing("file", "path")
        schema = options.get("schema") or _missing("file", "schema")
        reader = (
            spark.readStream.format(options.get("format", "parquet"))
            .schema(schema)
            .option("maxFilesPerTrigger", str(options.get("max_files_per_trigger", 8)))
        )
        if options.get("path_glob_filter"):
            reader = reader.option("pathGlobFilter", options["path_glob_filter"])
        return reader.load(path)
    if kind == "rate":
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(options.get("rows_per_second", 100)))
            .load()
        )
    if kind == "kafka":
        fmt, conf = kafka_source_config(**options)
        reader = spark.readStream.format(fmt)
        for k, v in conf.items():
            reader = reader.option(k, v)
        return reader.load()
    raise StreamConfigError(f"unknown source kind {kind!r}; supported: {SOURCE_KINDS}")


def open_sink(stream_df: DataFrame, kind: str, **options):
    """Configure a streaming sink by kind, returning the DataStreamWriter
    (caller picks trigger and .start()):

    - ``memory``: named in-memory table (local tests; options: name);
    - ``noop``: discard, timing/soak runs;
    - ``file``: parquet/json directory with checkpoint (options: path,
      checkpoint) — exactly-once via the file-sink commit log, the 100 TB
      landing path;
    - ``kafka``: options bootstrap_servers + topic (connector package
      required);
    - ``foreach_batch``: options fn(batch_df, epoch_id) — the escape hatch
      for idempotent upserts into external stores.
    """
    w = stream_df.writeStream.outputMode(options.get("output_mode", "append"))
    if options.get("checkpoint"):
        w = w.option("checkpointLocation", options["checkpoint"])
    if kind == "memory":
        return w.format("memory").queryName(options.get("name") or _missing("memory", "name"))
    if kind == "noop":
        return w.format("noop")
    if kind == "file":
        path = options.get("path") or _missing("file", "path")
        if not options.get("checkpoint"):
            _missing("file", "checkpoint")
        return w.format(options.get("format", "parquet")).option("path", path)
    if kind == "kafka":
        servers = options.get("bootstrap_servers") or _missing("kafka", "bootstrap_servers")
        return (
            w.format("kafka")
            .option("kafka.bootstrap.servers", servers)
            .option("topic", options.get("topic") or _missing("kafka", "topic"))
        )
    if kind == "foreach_batch":
        fn = options.get("fn") or _missing("foreach_batch", "fn")
        return w.foreachBatch(fn)
    raise StreamConfigError(f"unknown sink kind {kind!r}; supported: {SINK_KINDS}")


def _missing(kind: str, opt: str):
    raise StreamConfigError(f"source/sink kind {kind!r} requires option {opt!r}")


# -- custom stateful operator ---------------------------------------------
SESSION_STATE_SCHEMA = "n_events long, total_value double"
SESSION_OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"


def _running_totals(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user running totals — a custom stateful streaming operator via
    applyInPandasWithState (the Spark analog of flatMapGroupsWithState)."""
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]})


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Stateful per-user aggregation with explicit state management —
    the extension point for operators Spark's windowed aggs can't express
    (custom session logic, decaying counters, CEP-ish patterns)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _running_totals,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_upsert_to_table(
    stream_df: DataFrame,
    table,
    key_cols: list[str],
    order_cols: list[str],
    shuffle_partitions: int = 8,
):
    """foreachBatch upsert sink: drive the stream to completion, folding
    every micro-batch into a ManagedTable as latest-row-per-key state
    (ordered by ``order_cols``, e.g. [ts, event_id]).

    Each batch recomputes latest = max_by(row, order) over
    (current table ∪ batch) and swaps it in — idempotent per key and
    correct under out-of-order batch arrival, unlike a blind MERGE (which
    would let a LATE batch overwrite a newer row). This is the streaming
    CDC-apply pattern; at scale the same fold runs against a Delta/Iceberg
    target with the union replaced by a keyed MERGE + ts guard."""
    cols = [c for c in stream_df.columns]
    ordkey = F.struct(*[F.col(c) for c in order_cols])

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # batch_df.columns is NEVER empty (schema is fixed) — the real
        # empty-trigger check is isEmpty(), without which every dataless
        # trigger re-aggregates and rewrites the whole table
        if batch_df.isEmpty():
            return
        batch_latest = batch_df.groupBy(*key_cols).agg(
            F.max_by(F.struct(*[F.col(c) for c in cols]), ordkey).alias("_r")
        ).select("_r.*")
        merged = (
            table.df().select(*cols).unionByName(batch_latest)
            .groupBy(*key_cols)
            .agg(F.max_by(F.struct(*[F.col(c) for c in cols]), ordkey).alias("_r"))
            .select("_r.*")
        )
        # safe: _swap_in writes to a fresh dir BEFORE the pointer swap, so
        # the plan may read the current table contents while writing
        table._swap_in(merged, op="STREAM_UPSERT", validate=True)

    drive_stream(
        stream_df,
        lambda w: w.outputMode("update").foreachBatch(apply_batch),
        shuffle_partitions=shuffle_partitions,
        checkpoint_prefix="mesin_upsert_ckpt_",
    )
    return table.df()


def purchase_click_left_join(
    purchases: DataFrame,
    clicks: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream LEFT OUTER join — purchase_click_join's shape with
    outer emission: a purchase with no click inside ``horizon`` emits a
    null-click row, but only once the watermark passes the purchase's
    join window (p_ts + horizon), because until then a matching click
    could still arrive. That deferred-null behavior is THE semantic
    difference from batch left joins, and why the watermark bound is
    mandatory for outer stream joins (Spark rejects the query without
    it). With a finite replay the globally-last rows can stay unmatched
    in state (the watermark never passes them) — the test tier computes
    the exact expected emission set from the watermark rule."""
    return _purchase_click(purchases, clicks, horizon, watermark, "leftOuter")
