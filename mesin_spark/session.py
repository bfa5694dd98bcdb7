"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the same
configuration keys are the ones that matter on a real cluster — AQE for
runtime re-planning (skew joins, partition coalescing), UTC session time
zone so results are reproducible against the DuckDB oracle, Arrow for
every Python<->JVM data exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle partitions: ~#cores locally. On a 1000-executor cluster you would
# size this to 2-3x total cores (or simply let AQE coalesce from a high
# initial number); AQE's coalescePartitions makes the initial value mostly
# a ceiling, not a constant cost.
_DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(app_name: str = "mesin_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    Mirrors the reference's single ``ExecutionContext::new`` entry point
    (reference src/context.rs:36-40) — one engine handle per process.
    """
    cpus = cpus or _DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # spark.sql.files.openCostInBytes stays at the 4 MiB DEFAULT — a
        # measured rejection (round 13): with the multi-row-group fixtures,
        # drift-free interleaved A/B sweeps (tools/probe_opencost.py,
        # artifacts/r13/opencost_ab*.json) showed 64 KiB over-splits the
        # small-row tables (q_funnel 0.60→1.57 s, q_tpch_q1 1.51→2.35 s)
        # for a ~0.1 s/query win on the CPU-dense document scans, and
        # 1 MiB is a wash overall (events tier −0.2 s total, TPC-H and
        # span/pipeline +0.5 s total). The per-split scheduling overhead
        # at sf0.1 outweighs scan parallelism except where an operator
        # already carries an explicit spread.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    got = spark.sparkContext.master
    want = f"local[{cpus}]"
    if got != want:
        # getOrCreate returned a PRE-EXISTING session: master/memory/
        # shuffle-partition settings requested here did NOT apply — say so
        # rather than letting a benchmark measure the wrong parallelism
        import warnings

        warnings.warn(
            f"get_session: reusing existing SparkSession (master={got}); "
            f"requested {want} and static configs were ignored",
            RuntimeWarning,
            stacklevel=2,
        )
    spark.sparkContext.setLogLevel("WARN")
    return spark


#: Deployment profile for a large cluster (the 100 TB target this engine
#: is designed for: ~1000 executors x 4 cores). Returned as a plain dict
#: so callers feed it to SparkSession.builder.config(map=...) or their
#: submit tooling; get_session applies the local analogs of the same keys.
#: Rationale per key:
#: - shuffle.partitions ~2x total cores: AQE coalesces DOWN from this
#:   ceiling at runtime, so oversizing costs little and undersizing
#:   serializes the largest shuffles;
#: - initialPartitionNum lets AQE split before the first shuffle lands;
#: - maxPartitionBytes 256m: scan tasks sized so a full executor core set
#:   stays busy on 100 TB (~400k input splits) without task-launch storms;
#: - autoBroadcastJoinThreshold 64m: every TPC-H-shaped dimension
#:   (region/nation/supplier/part/customer slices) broadcasts; fact-fact
#:   joins still shuffle (or use bucketed layouts, sources.write_bucketed);
#: - skewJoin thresholds: AQE splits a straggler partition when it's 4x
#:   the median and >256m — the salting fallback in ext/skew.py is for
#:   aggregations, where AQE can't help;
#: - shuffle.service + dynamicAllocation: executors scale with stage
#:   demand, shuffle files survive executor loss;
#: - adaptive.forceOptimizeSkewedJoin: accept an extra shuffle to fix
#:   catastrophic skew (default off upstream; on at this scale).
def cluster_conf(total_cores: int = 4000) -> dict[str, str]:
    """Recommended Spark conf for the 100 TB deployment tier."""
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": str(4 * total_cores),
        "spark.sql.shuffle.partitions": str(2 * total_cores),
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "4",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(256 * 1024 * 1024),
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.shuffle.service.enabled": "true",
        "spark.dynamicAllocation.enabled": "true",
        "spark.dynamicAllocation.shuffleTracking.enabled": "true",
        "spark.speculation": "true",
        "spark.speculation.multiplier": "3",
    }
