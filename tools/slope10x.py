"""Third scale datapoint: shuffle-byte slopes at 10x data for the
shuffle-heavy headline queries. Two points (1x, 3x) bound a slope; the
10x point discriminates linear from quadratic beyond argument — a
quadratic candidate space shows slope ~100 here, a linear plan ~10.

Usage: python tools/slope10x.py [sf_dir] [out_json] [factor]
(out_json defaults to <repo>/artifacts/slope10x.json next to this file —
pass the current round's artifact dir to file it per-round; factor
defaults to 10 and generalizes the tool to any scale multiple, e.g. 100
for the three-orders-of-magnitude check)
"""

from __future__ import annotations

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from tools.make_scale import ensure_scaled  # noqa: E402
from tools.shuffle_audit import audit, fmt  # noqa: E402

#: the queries whose shuffle exceeds ~1 MiB at 1x — the only ones where
#: a slope is measurable above metric noise
HEAVY = [
    "q_dedup_minhash",
    "q_dedup_ngram",
    "q_minhash_portable",
    "q_span_removal",
    "q_tfidf",
    "q_session_batch",
    "q_asof_join",
    "q_running_sum",
    "q_tpch_q21",
    "q_tpch_q18",
    "q_pagerank",
    "q_pipeline_e2e",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    from mesin_spark.session import get_session
    import __spark_entry__ as entrymod

    spark = get_session("mesin_spark-slope10x")
    spark.sparkContext.setLogLevel("ERROR")
    registry = entrymod.queries()
    store = spark._jsparkSession.sharedState().statusStore()

    scaled_dir = ensure_scaled(sf_dir, factor)
    base = audit(spark, store, registry, HEAVY, sf_dir)
    big = audit(spark, store, registry, HEAVY, scaled_dir)

    rows = {}
    for name in HEAVY:
        b, s = base[name]["shuffle"], big[name]["shuffle"]
        slope = (s / b) if b else 0.0
        # factor-specific keys ("shuffle_10x" at factor 10) keep the
        # artifact schema stable across rounds: a consumer comparing
        # prior rounds' slope10x.json files sees the same names, and a
        # 100x run is self-describing instead of an ambiguous "Nx"
        rows[name] = {
            "shuffle_1x": b,
            f"shuffle_{factor}x": s,
            f"slope_{factor}x": round(slope, 2),
            f"spill_{factor}x": big[name]["spill"],
        }
        print(
            f"{name:22s} {fmt(b):>12s} -> {fmt(s):>12s}  slope {slope:.2f}"
            f"  spill@{factor}x {fmt(big[name]['spill'])}"
        )
    total_b = sum(r["shuffle_1x"] for r in rows.values())
    total_s = sum(r[f"shuffle_{factor}x"] for r in rows.values())
    out = {
        "sf_dir": sf_dir,
        "factor": factor,
        "queries": rows,
        f"total_slope_{factor}x": round(total_s / total_b, 2) if total_b else 0.0,
        f"worst_slope_{factor}x": max(r[f"slope_{factor}x"] for r in rows.values()),
        f"total_spill_{factor}x": sum(r[f"spill_{factor}x"] for r in rows.values()),
    }
    print(
        f"total {fmt(total_b)} -> {fmt(total_s)} slope "
        f"{out[f'total_slope_{factor}x']:.2f} (linear = {factor}.0), worst "
        f"{out[f'worst_slope_{factor}x']:.2f}"
    )
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO_ROOT, "artifacts", "slope10x.json")
    )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
