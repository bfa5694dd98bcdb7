"""Interleaved A/B of spark.sql.files.openCostInBytes values per query.

Sequential full benches on this host drift 1.3-3x between windows
(documented since r06), so config comparisons MUST interleave: for each
query, the settings alternate round-robin inside ONE JVM and one time
window (openCostInBytes is a runtime SQL conf). min-of-N per setting.

Usage: python tools/probe_opencost.py <out.json> <cost1,cost2,...> <query ...>
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> int:
    out_path = sys.argv[1]
    costs = [int(c) for c in sys.argv[2].split(",")]
    names = sys.argv[3:]
    sf_dir = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("AB_RUNS", "3"))

    import __spark_entry__ as entrymod
    from mesin_spark.session import get_session

    spark = get_session("probe_opencost")
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
        best = {c: float("inf") for c in costs}
        for _ in range(runs):
            for c in costs:
                spark.conf.set("spark.sql.files.openCostInBytes", str(c))
                t0 = time.perf_counter()
                noop(fn(spark, sf_dir))
                best[c] = min(best[c], time.perf_counter() - t0)
        results[name] = {str(c): round(v, 3) for c, v in best.items()}
        print(name, results[name], flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
