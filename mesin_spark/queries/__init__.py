"""Query registry — the oracle-checked operator inventory.

Every operator from SURVEY.md §2 with status ``impl``/``decl`` (plus the
extension tier) registers here as a named query: a Spark callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, a matching
DuckDB oracle SQL string. ``__spark_entry__.py`` re-exports this registry
verbatim for the driver's correctness gate.

Conventions (SURVEY.md §7.3, FIXTURES.md oracle caveats):
- every computed column is aliased identically on both sides;
- double aggregates are rounded on both sides so engine-order summation
  ulps can't flip the value hash;
- timestamps are cast to DATE / epoch seconds in outputs (ms vs ns vs us
  parquet physical types would otherwise hash-mismatch);
- every ORDER BY that feeds a LIMIT carries a unique tie-break key.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mesin_spark.functions import stable_round as R  # noqa: F401  (re-exported)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

_SCRATCH: list[str] = []


def scratch_dir(prefix: str) -> str:
    """mkdtemp with PROCESS-EXIT cleanup: write-path queries (connector
    round-trips, DML/DDL, layout rewrites, ANN index builds) run on
    every certification pass, and bare mkdtemp left a full-table copy in
    /tmp per query per run — unbounded disk growth on a long-lived
    host."""
    d = tempfile.mkdtemp(prefix=prefix)
    if not _SCRATCH:
        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _SCRATCH]
        )
    _SCRATCH.append(d)
    return d


def sr(expr: str, n: int) -> str:
    """SQL text of the stable-round formula (see functions.stable_round) —
    inlined into oracle SQL so both engines run the identical arithmetic."""
    scale = float(10**n)
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` → driver does a rows-only check
    (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table through the robust source reader (ns
    timestamps → µs, NTZ → LTZ under the UTC session) — plain parquet
    underneath, so Catalyst predicate pushdown + column pruning still
    reach the scan."""
    from mesin_spark.sources import read_parquet

    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects outright — the robust source reader converts it to a µs
    timestamp (see mesin_spark.sources.read_parquet)."""
    from mesin_spark.sources import read_parquet

    return read_parquet(spark, os.path.join(sf_dir, "events.parquet"))


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register testdata tables as temp views for the SQL path."""
    for n in names:
        T(spark, sf_dir, n).createOrReplaceTempView(n)


def load_all() -> None:
    """Import every query module (each import populates the registry).

    Registration order == the driver's certification order, and the driver
    runs under a wall-clock budget (round 1 stopped after the first 50
    entries). Cheapest queries register FIRST so a budget cutoff certifies
    the maximum count: sub-second relational/setop/window/join/subquery/
    function/aggregate queries, then TPC-H and the SQL-surface menus, then
    event analytics and storage (writes), and last the llm/dedup/ANN/
    streaming tier whose Arrow-UDF cold starts and stream drives dominate
    per-query wall time (sf0.01 profile: first ~170 queries ≈ 90s, llm
    tier ≈ 110s).
    """
    from mesin_spark.queries import (  # noqa: F401
        relational,
        setops,
        subqueries,
        windows,
        joins,
        functions_menu,
        aggregates,
        tpch,
        sql_menu2,
        sql_menu3,
        sql_menu4,
        sql_menu5,
        events,
        events2,
        llm5,
        connectors,
        stats_menu,
        storage,
        dml,
        llm3,
        llm2,
        llm,
        llm4,
        dialects,
    )
    _rotate_certified_to_tail()


def _rotate_certified_to_tail(root: str | None = None) -> None:
    """Reorder the registry so the driver's fixed-size verification prefix
    (50 names/round) lands on the names that most need a CORRECTNESS row:
    [names whose LATEST driver row is red] + [never-certified names] +
    [green-certified names], preserving the cheap-first cost order within
    each group.

    Only a fully-green row (rows+schema+hash all true, or a clean
    rows-only run for queries without an oracle) counts as certified —
    a FAILED or errored name rotates to the HEAD so the fix is
    re-certified next round instead of waiting behind the whole backlog.
    Rows are read from the CORRECTNESS_r*.json files the driver itself
    writes (and commits) at the repo root; given the same checkout the
    ordering is deterministic. No-op when no CORRECTNESS file exists.
    The full registry is still exact-verified every round regardless of
    order via tools/verify_oracle.py.

    Within the certified tail, names order by the round that LAST
    certified them, oldest first — once the never-certified backlog
    drains, the driver's prefix automatically starts re-verifying the
    stalest green rows, so every certified name is periodically
    re-checked instead of parked forever."""
    import glob
    import json

    if root is None:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
    # latest verdict per name wins: walk rounds in ascending order and
    # overwrite, so a name red in r03 but green in r04 counts as green
    latest: dict[str, bool] = {}
    last_green_round: dict[str, int] = {}
    for rnd, p in enumerate(sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))):
        try:
            with open(p) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            # Certified = a fully-green exact row, OR a clean rows-only
            # record for a name that still has no oracle today (the
            # expected outcome of the weaker check — parking it is
            # correct, and the oldest-first tail ordering re-checks it
            # periodically). A rows-only record for a name that NOW has
            # an oracle (converted since the record) stays in the head
            # group so the driver records the exact row; so does any
            # red/errored row. Without the clean-rows-only arm the
            # rows-only names would accumulate at the head forever and
            # starve the never-certified backlog out of the driver's
            # fixed-size prefix.
            exact_green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            rows_only_clean = (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
                and name not in ORACLE
            )
            latest[name] = exact_green or rows_only_clean
            if latest[name]:
                last_green_round[name] = rnd
    if not latest:
        return
    failed = {n for n, ok in latest.items() if not ok}
    certified = {n for n, ok in latest.items() if ok}
    tail = sorted(
        (n for n in QUERIES if n in certified),
        key=lambda n: last_green_round.get(n, 0),
    )
    ordered = (
        [n for n in QUERIES if n in failed]
        + [n for n in QUERIES if n not in failed and n not in certified]
        + tail
    )
    rotated = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(rotated)
    oracle = {n: ORACLE[n] for n in ordered if n in ORACLE}
    ORACLE.clear()
    ORACLE.update(oracle)
