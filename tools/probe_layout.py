"""Interleaved A/B of two fixture DIRECTORIES (e.g. multi- vs
single-row-group parquet layouts) per query — same drift-free protocol
as probe_opencost.py: settings alternate round-robin inside one JVM.

Usage: python tools/probe_layout.py <out.json> <dirA> <dirB> <query ...>
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> int:
    out_path, dir_a, dir_b = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    runs = int(os.environ.get("AB_RUNS", "3"))

    import __spark_entry__ as entrymod
    from mesin_spark.session import get_session

    spark = get_session("probe_layout")
    spark.sparkContext.setLogLevel("ERROR")
    registry = entrymod.queries()

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    warm = "/root/testdata/sf0.001"
    results: dict[str, dict[str, float]] = {}
    for name in names:
        fn = registry[name]
        if os.path.isdir(warm):
            noop(fn(spark, warm))
        best = {dir_a: float("inf"), dir_b: float("inf")}
        for _ in range(runs):
            for d in (dir_a, dir_b):
                t0 = time.perf_counter()
                noop(fn(spark, d))
                best[d] = min(best[d], time.perf_counter() - t0)
        results[name] = {d: round(v, 3) for d, v in best.items()}
        print(name, results[name], flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
