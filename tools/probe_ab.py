"""Targeted min-of-N noop timing for named queries — the per-change A/B
probe (bench methodology: warm-up at sf0.001, then min of N timed noop
runs at the target SF, one shared JVM).

Usage: python tools/probe_ab.py <label> <query> [query ...]
Env:   AB_SF_DIR (default /root/testdata/sf0.1), AB_RUNS (default 3)
Appends one JSON line per query to artifacts/r13/ab_<label>.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> int:
    label = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("AB_RUNS", "3"))

    import __spark_entry__ as entrymod
    from mesin_spark.session import get_session

    spark = get_session("probe_ab")
    spark.sparkContext.setLogLevel("ERROR")
    registry = entrymod.queries()
    out_path = os.path.join(REPO_ROOT, "artifacts", "r13", f"ab_{label}.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    warm = "/root/testdata/sf0.001"
    for name in names:
        fn = registry[name]
        if os.path.isdir(warm):
            noop(fn(spark, warm))
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            noop(fn(spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 3))
        rec = {"label": label, "query": name, "sf_dir": sf_dir,
               "min": min(times), "runs": times}
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
