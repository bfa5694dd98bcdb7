"""File sources — Parquet-first (the driver testdata format), with a
robust reader for physical types Spark's vectorized reader rejects.

Spark refuses parquet TIMESTAMP(NANOS) columns outright
(PARQUET_TYPE_ILLEGAL). The fix: read nanos as raw INT64 (legacy
``spark.sql.legacy.parquet.nanosAsLong`` conf), then convert to µs
timestamps (integer-division truncation — Spark's own ns behavior
elsewhere). The parquet footer (via pyarrow, driver-side metadata only —
no data pulled) tells us which columns need the conversion.

The reference has no readers at all (its catalog is three hardcoded
tables, src/context.rs:17-34); this module is the engine's actual
source layer: parquet/csv/json/orc via the standard Spark readers.
"""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _nanos_columns(path: str) -> list[str]:
    """Column names stored as INT64 TIMESTAMP(NANOS), from the footers
    of EVERY file in the directory (mixed-file dirs: a column is ns-typed
    if any file stores it as ns — one writer upgrading precision mid-ingest
    must not silently break the read). Footer reads are driver-side
    metadata only.

    The check is against the parquet PHYSICAL+LOGICAL type, not the
    arrow-mapped type: pyarrow also reports legacy INT96 timestamps
    (Spark's own default writer output) as ``timestamp[ns]``, but Spark
    reads INT96 natively — flagging those would route a plain TIMESTAMP
    column into the nanos-as-long conversion and break on `ts div 1000`."""
    import glob
    import os

    if os.path.isdir(path):
        # RECURSIVE: hive-partitioned layouts keep files under key=value
        # subdirectories — a top-level-only glob would return [] and the
        # plain read would crash on exactly the ns files this function
        # exists to detect
        files = sorted(
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        ) or sorted(glob.glob(os.path.join(path, "**", "part-*"), recursive=True))
        files = [f for f in files if os.path.isfile(f)]
    else:
        files = [path]
    out: list[str] = []
    for f in files:
        sch = pq.ParquetFile(f).schema
        for i in range(len(sch)):
            col = sch.column(i)
            if (
                col.physical_type == "INT64"
                and "nanos" in str(col.logical_type).lower()
                and col.path not in out
            ):
                out.append(col.path)
    return out


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read that tolerates ns-timestamp columns.

    The legacy ``nanosAsLong`` conf is saved and restored around the read
    (try/finally), so a later plain ``spark.read.parquet`` elsewhere in the
    session keeps its normal behavior — the captured schema travels with
    the returned DataFrame, so restoring the conf does not affect its
    execution (verified: count() after restore yields the long-typed read)."""
    ns_cols = _nanos_columns(path)
    if not ns_cols:
        return _ntz_to_ltz(spark.read.parquet(path))
    prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)
    for c in ns_cols:
        # integer division (`div`), not `/1000` — the double round-trip is
        # off by 1µs at 10^18-nano magnitudes
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return _ntz_to_ltz(df)


def _ntz_to_ltz(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to TIMESTAMP (LTZ). Parquet µs timestamps
    with isAdjustedToUTC=false surface as NTZ, which half the timestamp
    function surface (unix_micros, window vs current_timestamp, stream
    watermarks) rejects in binary ops against LTZ. The session timezone is
    pinned to UTC (session.py), so the cast is value-preserving: the naive
    wall-clock IS the UTC instant, matching what DuckDB computes on the
    same files."""
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    """CSV with explicit schema preferred (inference = an extra full scan)."""
    reader = spark.read.option("header", str(header).lower())
    return (reader.schema(schema) if schema is not None else reader.option("inferSchema", "true")).csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    return (reader.schema(schema) if schema is not None else reader).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the other columnar interchange format (Hive ecosystem);
    like parquet it carries its own schema + per-stripe min/max stats, so
    predicate pushdown works on read. Distributed write."""
    df.write.mode(mode).orc(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    """CSV sink (one file per partition — a distributed write, no driver
    funnel). CSV is schema-less: pair with an explicit schema on read."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the interchange format of most LLM data tooling
    (one object per line, splittable, appendable). Distributed write."""
    df.write.mode(mode).json(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table (hash-partitioned into a fixed bucket count,
    registered in the session catalog). Joins and aggregations keyed on the
    bucket columns read co-located data and skip their shuffle entirely —
    THE layout lever for repeated fact-fact joins at 100 TB (e.g.
    lineitem⋈orders on orderkey). ``sort_cols`` additionally sorts within
    buckets, upgrading sort-merge joins to zero-sort merges."""
    if mode == "overwrite":
        # a warehouse dir left by a previous session (table no longer in
        # this session's in-memory catalog) would fail saveAsTable with
        # LOCATION_ALREADY_EXISTS — drop both the entry and the orphan dir
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = os.path.join(warehouse.removeprefix("file:"), table_name)
        if os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def zorder_key(cols, bits: int = 10):
    """Morton / Z-order key: interleave the low ``bits`` bits of each
    column (col j's bit b lands at position b·k+j), so sorting by the key
    clusters rows that are close in EVERY dimension. Written with
    ``write_parquet(sort_by=[zorder_key(...)])`` this gives row-group
    min/max pruning on all the interleaved columns at once — the
    multi-dimensional data-skipping lever (Delta OPTIMIZE ZORDER BY's
    core) that a single-column sort can't provide at 100 TB.

    Pure portable shift/mask arithmetic (codegen'd, oracle-reproducible);
    callers pre-bucket values into [0, 2^bits), e.g. with pmod."""
    from pyspark.sql import functions as F

    k = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cols):
            cc = (F.col(c) if isinstance(c, str) else c).cast("long")
            bit = F.shiftright(cc, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * k + j)
    return z


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
) -> None:
    """Parquet sink with optional layout control: partition columns for
    partition pruning, sort-within-partitions for min/max row-group
    pruning — the two levers that matter at 100 TB."""
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 256,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~target-sized files (the
    small-files compaction every long-running ingest needs — thousands of
    KB-sized files destroy scan scheduling and footer-read time at scale).

    File count = ceil(total_bytes / target). Writes to a sibling temp dir
    and atomically swaps, so readers never observe a half-written table.
    Returns the new file count."""
    import glob
    import math
    import os
    import shutil
    import uuid

    total = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    ) or sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.startswith("part-")
    )
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if sort_by:
        df = df.repartition(n_files).sortWithinPartitions(*sort_by)
    else:
        df = df.coalesce(n_files) if df.rdd.getNumPartitions() > n_files else df.repartition(n_files)
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files


def zone_map(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Per-FILE min/max/count statistics (zone map) for ``cols``, built in
    one distributed scan over the hidden ``_metadata.file_path`` column.

    This is the data-skipping index a table format keeps in its commit log
    (Delta/Iceberg file stats): build it once after ingest/compaction,
    persist it, and prune file lists against predicates BEFORE the read —
    complementary to zorder_key, which makes these min/max ranges tight
    for multi-column predicates. The map is one row per file (metadata
    scale, ~10^5 rows for a 100 TB table), so it broadcasts."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return (
        df.select(F.col("_metadata.file_path").alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )


def pruned_parquet(
    spark: SparkSession,
    path: str,
    col: str,
    lo,
    hi,
    zm: DataFrame | None = None,
) -> DataFrame:
    """Read only the files whose [min, max] zone overlaps [lo, hi] —
    file-level data skipping on top of parquet. The surviving-file list is
    a bounded driver collect over the file-count-sized zone map (the same
    metadata-sized collect a format's log replay does). The caller still
    applies the residual predicate: zones only prove which files CANNOT
    match."""
    zm = zone_map(spark, path, [col]) if zm is None else zm
    keep = zm.filter(
        (F.col(f"{col}_min") <= F.lit(hi)) & (F.col(f"{col}_max") >= F.lit(lo))
    )
    files = [r["file"] for r in keep.select("file").collect()]
    if not files:
        return spark.read.parquet(path).limit(0)
    return spark.read.parquet(*files)


def zone_map_kmv(
    spark: SparkSession, path: str, cols: list[str], key_col: str, k: int = 64
) -> DataFrame:
    """Zone map augmented with a per-FILE KMV distinct sketch of
    ``key_col``: min/max/count per file PLUS the k-minimum-value array
    and distinct estimate — one extra metadata column that answers the
    questions plain min/max can't: per-file distinct cardinality and
    (via ext.sketches.kmv_overlap) KEY OVERLAP between file pairs.
    High pairwise overlap means the key is interleaved across files —
    the signal that a compaction / re-cluster (zorder_key, sort_by)
    would make zone ranges tight and data skipping effective. Still one
    distributed scan; the result is file-count-sized metadata."""
    from mesin_spark.ext.sketches import kmv_sketch

    df = spark.read.parquet(path)
    keyed = df.select(F.col("_metadata.file_path").alias("file"), *cols, key_col)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    base = keyed.groupBy("file").agg(*aggs)
    sk = kmv_sketch(keyed.select("file", key_col), "file", key_col, k=k)
    return base.join(sk, "file")
