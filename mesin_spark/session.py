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
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
