#!/usr/bin/env python
"""Reliable-checkpoint CADENCE sweep for pagerank at the 100x corpus —
round-11 verdict watch item #2: probe_reliable.py showed the reliable
backend costs +28% on q_pagerank at the pinned cadence
(checkpoint_every=3 of 6 rounds) but "cadence is a tunable the table
doesn't yet explore".

This tool explores it: the SAME q_pagerank computation (the registry
query's exact construction — _purchase_edges, max_iter=6,
broadcast_ranks=True, final_checkpoint=False) is run in a fresh JVM per
(backend, cadence) cell:

    local@3  (the registry default — the probe_reliable baseline)
    reliable@{1, 2, 3, 6}

and each cell records wall seconds, physical shuffle bytes, DURABLE
checkpoint bytes actually written (du over the checkpoint dir — the
real recovery-cost axis: what a lost-executor refetch can read back),
and the order-insensitive row checksum. Cadence changes only WHERE
lineage is truncated, never the per-round arithmetic, so the parent
asserts every cell's checksum is identical — the knob trades recovery
granularity against durable-write volume and wall time, not values.

Note reliable@6 with final_checkpoint=False never checkpoints inside
the loop at all — its durable bytes are the two setup frames (e_norm,
nodes) only, and a mid-iteration executor loss replays up to 6 rounds.
That end of the spectrum is the honest "how much of the +28% is the
loop vs the setup" decomposition.

Usage:
    python tools/probe_cadence.py [sf_dir] [out_json] [factor]
    python tools/probe_cadence.py --one <backend> <cadence> <scaled_dir>
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

CELLS = [("local", 3), ("reliable", 1), ("reliable", 2), ("reliable", 3),
         ("reliable", 6)]
TIMEOUT = int(os.environ.get("PROBE_TIMEOUT", "2400"))
CKDIR = "/tmp/mesin_cadence_probe"


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _child(backend: str, cadence: int, scaled_dir: str) -> int:
    from pyspark.sql import functions as F

    from mesin_spark.ext.graph import pagerank
    from mesin_spark.queries.stats_menu import _purchase_edges
    from mesin_spark.session import get_session
    from tools.shuffle_audit import execution_metric_totals

    spark = get_session("mesin_probe_cadence")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("mesin.checkpoint.backend", backend)
    spark.conf.set("mesin.checkpoint.dir", CKDIR)
    store = spark._jsparkSession.sharedState().statusStore()
    first_id = store.executionsList().size()
    t0 = time.time()
    ranks = pagerank(
        _purchase_edges(spark, scaled_dir),
        max_iter=6,
        checkpoint_every=cadence,
        broadcast_ranks=True,
        final_checkpoint=False,
    )
    # the registry query's sink shape: top-20 by rank — rank rounded to
    # 9dp exactly as q_pagerank returns it, so checksums compare the
    # same frame the registry certifies
    df = (
        ranks.select("node", F.round(F.col("rank"), 9).alias("rank"))
        .orderBy(F.col("rank").desc(), "node")
        .limit(20)
    )
    row = df.selectExpr(
        "count(*) AS n",
        "sum(cast(xxhash64(struct(*)) AS DECIMAL(38,0))) AS h",
    ).collect()[0]
    wall = time.time() - t0
    tot = execution_metric_totals(store, first_id)
    print(json.dumps({
        "backend": backend, "cadence": cadence, "sec": round(wall, 1),
        "shuffle_bytes": tot["shuffle"], "spill_bytes": tot["spill"],
        "durable_ckpt_bytes": _du(CKDIR) if backend == "reliable" else 0,
        "rows": int(row["n"]), "checksum": int(row["h"] or 0),
    }))
    return 0


def main() -> int:
    if len(sys.argv) >= 2 and sys.argv[1] == "--one":
        return _child(sys.argv[2], int(sys.argv[3]), sys.argv[4])

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO_ROOT, "artifacts", "probe_cadence.json")
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    from tools.make_scale import ensure_scaled

    scaled_dir = ensure_scaled(sf_dir, factor)
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    cells: list[dict] = []
    errors: list[str] = []
    for backend, cadence in CELLS:
        shutil.rmtree(CKDIR, ignore_errors=True)
        key = f"{backend}@{cadence}"
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one",
                 backend, str(cadence), scaled_dir],
                capture_output=True, text=True, timeout=TIMEOUT, env=env,
                cwd=REPO_ROOT,
            )
            line = next(
                (ln for ln in reversed(proc.stdout.splitlines())
                 if ln.startswith("{")), None,
            )
            if line is None:
                cells.append({"backend": backend, "cadence": cadence,
                              "error": f"child died rc={proc.returncode}: "
                                       f"{proc.stderr[-300:]}"})
                errors.append(key)
            else:
                cells.append(json.loads(line))
        except subprocess.TimeoutExpired:
            cells.append({"backend": backend, "cadence": cadence,
                          "error": f"TIMEOUT after {TIMEOUT}s"})
            errors.append(key)
        r = cells[-1]
        status = (
            f"ERROR {r['error'][:100]}" if "error" in r else
            f"{r['sec']}s shuffle={r['shuffle_bytes'] / 2**20:.1f}MiB "
            f"durable={r['durable_ckpt_bytes'] / 2**20:.1f}MiB"
        )
        print(f"pagerank {key:12s} {status}", flush=True)

    shutil.rmtree(CKDIR, ignore_errors=True)
    sums = {(c["rows"], c["checksum"]) for c in cells if "checksum" in c}
    mismatch = len(sums) > 1
    out = {
        "sf_dir": sf_dir, "factor": factor, "query": "q_pagerank(max_iter=6)",
        "cells": cells, "checksum_mismatch": mismatch, "hard_errors": errors,
        "note": "single-run walls in fresh JVMs; durable_ckpt_bytes is the "
                "on-disk checkpoint footprint (recovery capital); cadence "
                "must not change values — one distinct checksum expected",
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}; mismatch={mismatch}; errors={errors or 'none'}")
    return 1 if (mismatch or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
