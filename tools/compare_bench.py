"""Compare two bench JSON outputs and flag per-query regressions.

The driver records ``BENCH_r{N}.json`` each round; this tool diffs the
current ``python bench.py`` line (or a saved file) against a previous
round's record so a slow query shows up as a named delta, not a buried
total.

Usage:
    python bench.py | tail -1 > /tmp/bench_now.json
    python tools/compare_bench.py BENCH_r01.json /tmp/bench_now.json

Exit code 1 if any shared query slowed more than THRESHOLD (default 1.5x,
override with $BENCH_REGRESSION_THRESHOLD) — usable as a CI-style gate.
"""

from __future__ import annotations

import json
import os
import sys

THRESHOLD = float(os.environ.get("BENCH_REGRESSION_THRESHOLD", "1.5"))


def load(path: str) -> dict:
    """Accept either a raw bench JSON line or the driver's BENCH_r{N}
    wrapper (which stores the JSON line inside a "tail" text field)."""
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc
    for line in reversed(doc.get("tail", "").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                inner = json.loads(line)
            except json.JSONDecodeError:
                continue  # truncated capture or a log line starting with '{'
            if "queries" in inner:
                return inner
    raise SystemExit(f"{path}: no bench record found")


def load_slopes(path: str, record: dict) -> dict[str, float]:
    """Per-query scale slopes (t(3x)/t(1x)) for a bench record.

    Rounds ≤3 embedded them as record['scale2']['slope']; bench.py now
    routes the two-scale block to a BENCH_SCALE2.json side file next to
    the record (so the driver's last-line capture stays short). Returns {}
    when neither exists — the wall-time gate still runs."""
    slopes = record.get("scale2", {}).get("slope")
    if slopes:
        return slopes
    # the side file must belong to THIS record: bench.py stamps it with
    # the run's primary timings; a mismatch means the file is from a
    # different (older or newer) run and its slopes don't apply. Because
    # the stamp alone decides ownership, it is safe to probe BOTH the
    # record's directory and the working directory (the documented usage
    # pipes the record to /tmp while bench.py writes the side file at
    # the repo root).
    candidates = [
        os.path.join(os.path.dirname(os.path.abspath(path)), "BENCH_SCALE2.json"),
        os.path.join(os.getcwd(), "BENCH_SCALE2.json"),
    ]
    for side in candidates:
        try:
            with open(side) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            continue
        if doc.get("t1_queries") == record.get("queries"):
            return doc.get("slope", {})
    return {}


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    prev, curr = load(sys.argv[1]), load(sys.argv[2])
    pq, cq = prev["queries"], curr["queries"]
    shared = sorted(set(pq) & set(cq))
    regressions = []
    print(f"{'query':28s} {'prev':>8s} {'curr':>8s} {'ratio':>7s}")
    for name in shared:
        if pq[name] > 0:
            ratio = cq[name] / pq[name]
        else:
            # zero baseline (recorded skip/failure placeholder): flag only
            # if curr is genuinely nonzero, never inf-on-zero-vs-zero
            ratio = 1.0 if cq[name] == 0 else float("inf")
        mark = " <-- REGRESSION" if ratio > THRESHOLD else ""
        print(f"{name:28s} {pq[name]:8.3f} {cq[name]:8.3f} {ratio:6.2f}x{mark}")
        if ratio > THRESHOLD:
            regressions.append(name)
    only_prev, only_curr = set(pq) - set(cq), set(cq) - set(pq)
    if only_curr:
        print(f"new queries (no baseline): {sorted(only_curr)}")
    if only_prev:
        print(f"dropped queries: {sorted(only_prev)}")
    pt = sum(pq[n] for n in shared)
    ct = sum(cq[n] for n in shared)
    if pt > 0:
        print(f"\nshared-query total: {pt:.2f}s -> {ct:.2f}s ({ct / pt:.2f}x)")
    else:
        print("\nno shared queries with a nonzero baseline — nothing to compare")
    # scale-slope gate: a query whose t(3x)/t(1x) slope grew >THRESHOLD×
    # between rounds has a scaling regression even if its sf0.1 wall-time
    # held — exactly the class the single-scale diff above cannot see
    ps, cs = load_slopes(sys.argv[1], prev), load_slopes(sys.argv[2], curr)
    slope_regressions = []
    # A slope regression needs BOTH a round-over-round ratio jump AND a
    # current slope that is actually superlinear-ish: slope estimates
    # compound two jittery timings (bench.py documents ~1.4x min-of-RUNS
    # noise on sub-2s plans), so a bare 1.5x ratio between two sub-linear
    # measurements is indistinguishable from noise.
    SLOPE_FLOOR = float(os.environ.get("BENCH_SLOPE_FLOOR", "2.0"))
    shared_s = sorted(set(ps) & set(cs))
    if not shared_s:
        # per-query slopes unavailable for one side (an old round's side
        # file was overwritten, or the current record sits away from its
        # BENCH_SCALE2.json) — fall back to the worst-slope scalar both
        # records carry inline, and SAY so: a gate that silently runs
        # zero comparisons is a gate that silently dropped
        pw, cw = prev.get("scale2_worst_slope"), curr.get("scale2_worst_slope")
        if pw is not None and cw is not None:
            print(f"\nworst scale slope: {pw:.2f} -> {cw:.2f}")
            if pw > 0 and cw / pw > THRESHOLD and cw > SLOPE_FLOOR:
                slope_regressions.append("<worst_slope>")
        else:
            print(
                "\nslope gate: no per-query slopes on "
                + ("both sides" if not ps and not cs else
                   ("prev side" if not ps else "curr side"))
                + " and no inline worst-slope pair — slope comparison skipped"
            )
    if shared_s:
        print(f"\n{'query':28s} {'prev_slope':>10s} {'curr_slope':>10s}")
        for name in shared_s:
            ratio = cs[name] / ps[name] if ps[name] > 0 else float("inf")
            bad = ratio > THRESHOLD and cs[name] > SLOPE_FLOOR
            mark = " <-- SLOPE REGRESSION" if bad else ""
            print(f"{name:28s} {ps[name]:10.2f} {cs[name]:10.2f}{mark}")
            if bad:
                slope_regressions.append(name)
    if regressions:
        print(f"REGRESSED (> {THRESHOLD}x): {regressions}")
    if slope_regressions:
        print(f"SLOPE REGRESSED (> {THRESHOLD}x): {slope_regressions}")
    return 1 if regressions or slope_regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
