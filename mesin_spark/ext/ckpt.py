"""Checkpoint backend for the iterative tiers — ONE knob for the
local-vs-reliable lineage-truncation trade.

Every iterative operator here (PageRank/PPR/HITS/k-core/label-prop,
connected-components dedup, k-means, BPE rounds, incremental matview
merge, MERGE post-images) truncates plan lineage each round so the
growing plan tree doesn't strangle the optimizer. HOW it truncates is a
reliability decision, not a detail:

- ``local`` (default): ``DataFrame.localCheckpoint`` — blocks live on
  the EXECUTORS that computed them, no lineage is retained. Fast (no
  external write), right for a single-JVM sandbox and for short
  interactive loops. On a real cluster this is a reliability trade: if
  ANY executor holding blocks is lost (routine on spot/preemptible
  nodes at 100 TB scale), the job FAILS unrecoverably — there is no
  lineage left to recompute from and no durable copy to refetch.
- ``reliable``: ``DataFrame.checkpoint`` after ensuring a checkpoint
  dir — blocks are written to the configured (durable, e.g. HDFS/object
  store) directory; executor loss refetches from storage instead of
  killing a 40-round iteration. Costs one write+read of the frame per
  checkpoint; at cluster scale that is the price of surviving node
  churn, and it is the backend a 1000-executor deployment should run.

Selection is by Spark conf so deployments flip it without touching
operator code::

    spark.conf.set("mesin.checkpoint.backend", "reliable")
    spark.conf.set("mesin.checkpoint.dir", "hdfs:///ckpt/mesin")
    # or at session build time via --conf

Both backends share the AQE/partitioning caveat documented at the call
sites (a checkpoint of either kind does not preserve hash-partitioning
metadata for AQE planning purposes), and both materialize eagerly by
default so the truncation happens at a deterministic point in the loop.
Equality of results across backends is pytest-asserted
(tests/test_ckpt.py::test_checkpoint_backend_equivalence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ckpt(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage via the configured checkpoint backend
    (``mesin.checkpoint.backend``: ``local`` default | ``reliable``).

    Call-site idiom keeps the method-chain shape the operators already
    use: ``frame.transform(ckpt, eager=True)``.
    """
    spark = df.sparkSession
    try:
        backend = spark.conf.get("mesin.checkpoint.backend", "local")
    except Exception:  # pragma: no cover — conf service gone mid-shutdown
        backend = "local"
    if backend == "reliable":
        sc = spark.sparkContext
        if sc.getCheckpointDir() is None:
            sc.setCheckpointDir(
                spark.conf.get("mesin.checkpoint.dir", "/tmp/mesin_ckpt")
            )
        return df.checkpoint(eager=eager)
    if backend != "local":
        raise ValueError(
            f"mesin.checkpoint.backend must be 'local' or 'reliable' — "
            f"got {backend!r}"
        )
    return df.localCheckpoint(eager=eager)
