#!/usr/bin/env python
"""100x-corpus probe: execute the operator catalog's heavy tier at a
100x scale-up of sf0.1 (tools/make_scale.ensure_scaled — ~60M lineitem
rows, ~59M edges, ~6.6M documents incl. planted dups) and record, per
operator, single-run wall seconds + the engine's own shuffle/spill byte
metrics, or the operator's DECLARED envelope error.

This is the round tool that institutionalizes round 8's /tmp probe loop
— the sweep that found four real scale bugs (ngram prefix broadcast
OOM, containment unguarded quadratic, random-walk int64 overflow,
tf-idf postings fan-out) that no sf0.1 measurement could see. A new
operator tier doesn't ship without either a probe row here or an entry
in EXPECTED_ENVELOPES declaring why it must refuse.

Each operator runs in its OWN subprocess (fresh JVM): a designed
envelope error, an OOM, or a timeout in one operator can't poison the
rest, and per-query heap is predictable. Correctness-bearing outcome:
every listed operator completes (or refuses with its documented
envelope error) with zero spill; walls are contended single runs, not
minimized benchmarks.

Usage:
    python tools/probe100x.py [sf_dir] [out_json] [factor] [names...]
    python tools/probe100x.py --one <name> <scaled_dir>   # child mode

Defaults: sf_dir=/root/testdata/sf0.1, out=artifacts/probe100x.json,
factor=100, names=OPERATORS. Needs SPARK_GRAFT_DRIVER_MEM>=24g for the
full list (the orchestrator sets it for children if unset).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

#: the heavy tier: every operator class that owns a join, agg, window,
#: iteration, or candidate-pair space big enough to have a scale
#: failure mode. (Cheap scalar/projection queries scale trivially and
#: are covered by the full-registry sf sweeps.)
OPERATORS = [
    # dedup tier
    "q_dedup_exact", "q_dedup_simhash", "q_dedup_containment",
    "q_dedup_minhash", "q_dedup_ngram", "q_minhash_portable",
    "q_simhash_portable", "q_clusters_portable", "q_dedup_embed",
    "q_fuzzy_join", "q_fuzzy_clusters", "q_span_removal", "q_decontaminate",
    "q_split_leakage_safe", "q_ngram_novelty", "q_source_overlap",
    "q_dedup_softweight",  # same fingerprint-window shape, probed for drift
    "q_token_budget",      # bounded-bin budget cut (round 11)
    "q_ann_incremental",   # frozen-artifact batch encode + append (round 11)
    "q_ann_compact",       # bin-pack + vacuum maintenance cycle (round 12)
    "q_lm_classifier", "q_lm_classifier_portable",  # in-engine trained
    "q_token_budget_learned",  # budget cut on the learned score (round 12)
    # text / sketch tier
    "q_tfidf", "q_tfidf_pairs", "q_bm25", "q_pmi_bigrams",
    "q_text_tokens", "q_bpe_train",
    # similarity / ANN / ML tier
    "q_sim_topk", "q_knn_join", "q_embed_pca", "q_kmeans_portable",
    "q_pca_portable",
    # graph tier
    "q_pagerank", "q_hits", "q_hits_portable", "q_ppr_portable",
    "q_label_prop", "q_kcore", "q_triangles", "q_random_walks",
    "q_link_prediction", "q_degree_stats",
    # events / sessions / windows
    "q_session_batch", "q_sessionize", "q_asof_join", "q_running_sum",
    "q_funnel", "q_gapfill", "q_retention", "q_pack_sequences",
    "q_skew_join", "q_pipeline_e2e",
    # TPC-H (all 22 — join/agg shapes)
    *[f"q_tpch_q{i}" for i in range(1, 23)],
]

#: operators that must REFUSE at this scale with a designed, documented
#: error — a matching failure is a PASS (the envelope held); completing
#: anyway is recorded too (envelope wider than declared, worth a look).
EXPECTED_ENVELOPES = {
    "q_hits_portable": "exceeds HITS_SCALE",  # >1e6 nodes by design
    # (fixed-point scores would floor to 0); the gap is closed by the
    # engine-native q_hits (floats, any |V|)
}

#: per-operator wall-clock ceiling, seconds (child killed past it)
TIMEOUT = int(os.environ.get("PROBE_TIMEOUT", "1800"))


def _child(name: str, scaled_dir: str) -> int:
    """Run ONE operator at the scaled dir; print one JSON line."""
    import __spark_entry__ as entrymod
    from mesin_spark.session import get_session
    from tools.shuffle_audit import audit

    spark = get_session("mesin_probe100x")
    spark.sparkContext.setLogLevel("ERROR")
    registry = entrymod.queries()
    store = spark._jsparkSession.sharedState().statusStore()
    t0 = time.time()
    try:
        metrics = audit(spark, store, registry, [name], scaled_dir)[name]
    except Exception as e:  # noqa: BLE001 — the envelope check is the point
        print(json.dumps({
            "name": name, "error": f"{type(e).__name__}: {e}"[:500],
        }))
        return 0
    print(json.dumps({
        "name": name, "sec": round(time.time() - t0, 1),
        "shuffle_bytes": metrics["shuffle"], "spill_bytes": metrics["spill"],
    }))
    return 0


def main() -> int:
    if len(sys.argv) >= 2 and sys.argv[1] == "--one":
        return _child(sys.argv[2], sys.argv[3])

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO_ROOT, "artifacts", "probe100x.json")
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    names = sys.argv[4:] or OPERATORS

    from tools.make_scale import ensure_scaled

    scaled_dir = ensure_scaled(sf_dir, factor)
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    results: dict[str, object] = {}
    spill_total = 0.0
    for name in names:
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name,
                 scaled_dir],
                capture_output=True, text=True, timeout=TIMEOUT, env=env,
                cwd=REPO_ROOT,
            )
            line = next(
                (ln for ln in reversed(proc.stdout.splitlines())
                 if ln.startswith("{")), None,
            )
            if line is None:
                results[name] = {
                    "error": f"child died rc={proc.returncode}: "
                             f"{proc.stderr[-300:]}",
                }
            else:
                row = json.loads(line)
                row.pop("name", None)
                results[name] = row
        except subprocess.TimeoutExpired:
            results[name] = {"error": f"TIMEOUT after {TIMEOUT}s"}
        row = results[name]
        expect = EXPECTED_ENVELOPES.get(name)
        if isinstance(row, dict) and "error" in row:
            if expect and expect in str(row["error"]):
                row["designed_error"] = row.pop("error")
                status = "designed-error (envelope held)"
            else:
                status = f"ERROR: {row['error'][:120]}"
        else:
            spill_total += row.get("spill_bytes", 0.0)
            status = (f"{row['sec']}s shuffle={row['shuffle_bytes'] / 2**20:.1f}MiB"
                      f" spill={row['spill_bytes']:.0f}")
            if expect:
                row["note"] = (
                    f"declared envelope ({expect!r}) did NOT trip — "
                    "completed anyway"
                )
        print(f"{name:24s} {status}  [{time.time() - t0:.0f}s incl. JVM]",
              flush=True)

    hard_errors = [
        n for n, r in results.items()
        if isinstance(r, dict) and "error" in r
    ]
    out = {
        "sf_dir": sf_dir, "factor": factor,
        "driver_mem": env["SPARK_GRAFT_DRIVER_MEM"],
        "timeout_sec": TIMEOUT,
        "results": results,
        "total_spill_bytes": spill_total,
        "hard_errors": hard_errors,
        "note": "single-run wall seconds per operator in a fresh JVM at "
                f"the {factor}x corpus; correctness-bearing outcome is "
                "completion (or the declared envelope error) with zero "
                "spill — walls are contended and unminimized",
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}; hard errors: {hard_errors or 'none'}")
    return 1 if hard_errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
