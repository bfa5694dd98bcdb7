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

Operational notes for the reliable backend:

- ``mesin.checkpoint.dir`` is re-applied whenever it differs from the
  SparkContext's current checkpoint dir (modulo the scheme-qualified
  prefix Spark adds), so changing the conf mid-session takes effect on
  the next ``ckpt()`` instead of being silently ignored.
- Reliable checkpoint files are cleaned by Spark's ContextCleaner only
  when ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (it
  defaults to false); without it a 40-round iteration leaves one
  durable frame copy per checkpoint for the app's lifetime. Set it
  alongside the backend knob::

      --conf mesin.checkpoint.backend=reliable \
      --conf mesin.checkpoint.dir=hdfs:///ckpt/mesin \
      --conf spark.cleaner.referenceTracking.cleanCheckpoints=true
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

#: one-shot flag for the missing-cleaner warning (list so it's mutable
#: without a global statement)
_WARNED_NO_CLEAN: list = []


def _ckpt_path_only(s: str) -> str:
    """Strip scheme AND authority, keep the path: Spark's
    getCheckpointDir returns fully-qualified forms (``file:/tmp/x``,
    ``hdfs://nn:8020/ckpt/...``) while the conf is usually written
    authority-less (``hdfs:///ckpt/mesin``), so only the path component
    compares stably. Dirs on different authorities with the same path
    therefore compare equal — acceptable: the conf names ONE deployment
    filesystem, and a false "same" merely skips a redundant re-set."""
    if "://" in s:
        rest = s.split("://", 1)[1]
        # authority (may be empty) runs to the first '/'; path from there
        slash = rest.find("/")
        rest = rest[slash:] if slash >= 0 else "/"
    elif s.startswith("file:"):
        rest = s[len("file:"):]
    else:
        rest = s
    return rest.rstrip("/") or "/"


def _same_ckpt_dir(have: str, want: str) -> bool:
    """getCheckpointDir returns a scheme-qualified, timestamped child of
    the dir that was SET (e.g. file:/tmp/mesin_ckpt/<uuid>), so the
    current dir matches the conf iff it IS the conf path or a child of
    it — a path-COMPONENT boundary, not a bare string prefix
    (``/data/ckpt_old`` is not a child of ``/data/ckpt``)."""
    h = _ckpt_path_only(have)
    w = _ckpt_path_only(want)
    return h == w or h.startswith(w + "/")


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
        want = spark.conf.get("mesin.checkpoint.dir", "/tmp/mesin_ckpt")
        have = sc.getCheckpointDir()
        if have is None:
            sc.setCheckpointDir(want)
        elif not _same_ckpt_dir(have, want):
            # conf changed mid-session — honor it (a silent ignore was
            # the round-10 ADVICE finding) and say so once per change
            warnings.warn(
                f"mesin.checkpoint.dir changed to {want!r} (was {have!r}); "
                "re-setting the SparkContext checkpoint dir. Earlier "
                "checkpoints in the old dir are NOT moved or cleaned — "
                "enable spark.cleaner.referenceTracking.cleanCheckpoints "
                "to have Spark clean checkpoints it no longer references.",
                stacklevel=2,
            )
            sc.setCheckpointDir(want)
        if spark.conf.get(
            "spark.cleaner.referenceTracking.cleanCheckpoints", "false"
        ).lower() != "true" and not _WARNED_NO_CLEAN:
            _WARNED_NO_CLEAN.append(True)
            warnings.warn(
                "reliable checkpoint backend without "
                "spark.cleaner.referenceTracking.cleanCheckpoints=true: "
                "checkpoint files accumulate for the app lifetime "
                "(one durable frame copy per ckpt() call)",
                stacklevel=2,
            )
        return df.checkpoint(eager=eager)
    if backend != "local":
        raise ValueError(
            f"mesin.checkpoint.backend must be 'local' or 'reliable' — "
            f"got {backend!r}"
        )
    return df.localCheckpoint(eager=eager)
