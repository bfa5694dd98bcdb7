#!/usr/bin/env python
"""Reliable-vs-local checkpoint backend probe at the 100x corpus — one
datapoint per ITERATIVE FAMILY (round-10 verdict ask #2: the knob routes
all checkpoint sites, but only pagerank had a measured reliable run).

Per (family, backend) the child runs the registered query in a fresh JVM
with ``mesin.checkpoint.backend`` set, and records wall seconds, the
engine's physical shuffle bytes, and an order-insensitive row checksum
(count + sum of xxhash64 over every row struct). The parent asserts the
checksum is IDENTICAL across backends — the knob trades recovery
semantics, never values — and writes the family × backend table that
SHUFFLE.md's manual section cites.

Families and why each is the family's interesting member:
- q_pagerank        — broadcast-rank rounds; tiny (≤|V|-row) ckpt frames
- q_kcore           — peel loop, shrinking edge+degree frames
- q_label_prop      — mode-propagation rounds, |V|-row label frames
- q_fuzzy_clusters  — pointer jumping; the LARGEST checkpointed frames
                      (|V|-row labels but built from a multi-GiB edge
                      tier) — where a durable write could actually bite
- q_kmeans_portable — centroid rounds, bounded driver frames
- q_bpe_train       — symbol-table rounds (batched merge selection)

Usage:
    python tools/probe_reliable.py [sf_dir] [out_json] [factor] [names...]
    python tools/probe_reliable.py --one <name> <backend> <scaled_dir>
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

FAMILIES = [
    "q_pagerank", "q_kcore", "q_label_prop", "q_fuzzy_clusters",
    "q_kmeans_portable", "q_bpe_train",
]

TIMEOUT = int(os.environ.get("PROBE_TIMEOUT", "2400"))


def _child(name: str, backend: str, scaled_dir: str) -> int:
    import __spark_entry__ as entrymod
    from mesin_spark.session import get_session
    from tools.shuffle_audit import execution_metric_totals

    spark = get_session("mesin_probe_reliable")
    spark.sparkContext.setLogLevel("ERROR")
    ckdir = f"/tmp/mesin_reliable_probe/{name}"
    spark.conf.set("mesin.checkpoint.backend", backend)
    spark.conf.set("mesin.checkpoint.dir", ckdir)
    # recommended alongside the reliable backend (ext/ckpt.py): let the
    # ContextCleaner drop checkpoints the app no longer references
    store = spark._jsparkSession.sharedState().statusStore()
    first_id = store.executionsList().size()
    q = entrymod.queries()[name]
    t0 = time.time()
    df = q(spark, scaled_dir)
    row = df.selectExpr(
        "count(*) AS n",
        # decimal sum: an int64 sum of 64-bit hashes overflows under ANSI
        "sum(cast(xxhash64(struct(*)) AS DECIMAL(38,0))) AS h",
    ).collect()[0]
    wall = time.time() - t0
    tot = execution_metric_totals(store, first_id)
    print(json.dumps({
        "name": name, "backend": backend, "sec": round(wall, 1),
        "shuffle_bytes": tot["shuffle"], "spill_bytes": tot["spill"],
        "rows": int(row["n"]), "checksum": int(row["h"] or 0),
    }))
    return 0


def main() -> int:
    if len(sys.argv) >= 2 and sys.argv[1] == "--one":
        return _child(sys.argv[2], sys.argv[3], sys.argv[4])

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO_ROOT, "artifacts", "probe_reliable.json")
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    names = sys.argv[4:] or FAMILIES

    from tools.make_scale import ensure_scaled

    scaled_dir = ensure_scaled(sf_dir, factor)
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    results: dict[str, dict] = {}
    mismatches: list[str] = []
    errors: list[str] = []
    for name in names:
        results[name] = {}
        for backend in ("local", "reliable"):
            shutil.rmtree("/tmp/mesin_reliable_probe", ignore_errors=True)
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--one",
                     name, backend, scaled_dir],
                    capture_output=True, text=True, timeout=TIMEOUT, env=env,
                    cwd=REPO_ROOT,
                )
                line = next(
                    (ln for ln in reversed(proc.stdout.splitlines())
                     if ln.startswith("{")), None,
                )
                if line is None:
                    results[name][backend] = {
                        "error": f"child died rc={proc.returncode}: "
                                 f"{proc.stderr[-300:]}",
                    }
                    errors.append(f"{name}/{backend}")
                else:
                    row = json.loads(line)
                    row.pop("name", None)
                    row.pop("backend", None)
                    results[name][backend] = row
            except subprocess.TimeoutExpired:
                results[name][backend] = {"error": f"TIMEOUT after {TIMEOUT}s"}
                errors.append(f"{name}/{backend}")
            r = results[name][backend]
            status = (
                f"ERROR {r['error'][:100]}" if "error" in r else
                f"{r['sec']}s shuffle={r['shuffle_bytes'] / 2**20:.1f}MiB "
                f"rows={r['rows']}"
            )
            print(f"{name:20s} {backend:9s} {status}", flush=True)
        lo, re_ = results[name].get("local", {}), results[name].get("reliable", {})
        if "checksum" in lo and "checksum" in re_:
            if (lo["checksum"], lo["rows"]) != (re_["checksum"], re_["rows"]):
                mismatches.append(name)
                print(f"{name:20s} CHECKSUM MISMATCH", flush=True)

    shutil.rmtree("/tmp/mesin_reliable_probe", ignore_errors=True)
    out = {
        "sf_dir": sf_dir, "factor": factor, "results": results,
        "checksum_mismatches": mismatches, "hard_errors": errors,
        "note": "single-run walls per (family, backend) in fresh JVMs at "
                f"the {factor}x corpus; correctness-bearing outcome is the "
                "cross-backend checksum equality",
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}; mismatches: {mismatches or 'none'}; "
          f"errors: {errors or 'none'}")
    return 1 if (mismatches or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
