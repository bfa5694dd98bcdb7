"""Skew-handling relational operators: salted two-phase aggregation and a
salted replicated equi-join.

Hot keys are the classic 100 TB failure mode: a groupBy/join shuffles on
its key, and one key holding 1% of a 100 TB fact table sends 1 TB through
a single reducer. Both operators here break that funnel with a salt while
provably preserving exact semantics (the oracle checks equality against
the plain formulation):

- ``salted_agg``: partial-aggregate on (key, salt) — S reducers share each
  hot key — then re-aggregate the S partials per key. Only decomposable
  aggregates (sum/count/min/max, and avg as sum/count) are offered, since
  those re-aggregate losslessly.
- ``salted_join``: the big side salts each row into one of S buckets; the
  small side is replicated across all S buckets (explode) — each hot key's
  probe rows split across S reducers instead of one. This is what AQE's
  skew-join optimization does at runtime; the explicit operator covers the
  planned case (known hot keys, or AQE unavailable mid-stage).

The reference engine has no aggregate/join execution at all (its
``execute()`` stops at plan printing, src/context.rs:53); these extend the
aggregate/join tier (SURVEY.md §2.3-2.4) with the scale-hardened forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (partial expr builder, final re-agg builder) per decomposable aggregate.
_DECOMPOSABLE = {
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    salt: Column,
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation over ``keys``: groupBy(keys + salt) computes
    partials, groupBy(keys) re-aggregates them. ``aggs`` is a list of
    (column, fn, alias) with fn in sum/count/min/max/avg; avg decomposes to
    sum+count and finishes as their ratio (exact for integer/floating
    inputs — the same double division one-phase avg performs; DECIMAL
    columns take Spark's decimal-division precision rules instead of
    avg's HALF_UP result scale, so compare-to-plain-avg tests should
    cast decimals to double first). ``salt`` is any deterministic expression; it is
    bucketed mod ``n_salt``."""
    partial_exprs, final_exprs, finish = [], [], []
    for col, fn, alias in aggs:
        if fn == "avg":
            partial_exprs += [F.sum(col).alias(f"_s_{alias}"), F.count(col).alias(f"_c_{alias}")]
            final_exprs += [F.sum(f"_s_{alias}").alias(f"_s_{alias}"),
                            F.sum(f"_c_{alias}").alias(f"_c_{alias}")]
            finish.append((F.col(f"_s_{alias}") / F.col(f"_c_{alias}")).alias(alias))
        elif fn in _DECOMPOSABLE:
            part, fin = _DECOMPOSABLE[fn]
            partial_exprs.append(part(col).alias(f"_p_{alias}"))
            final_exprs.append(fin(f"_p_{alias}").alias(f"_p_{alias}"))
            finish.append(F.col(f"_p_{alias}").alias(alias))
        else:
            raise ValueError(f"non-decomposable aggregate {fn!r}; use sum/count/min/max/avg")
    partial = df.groupBy(*keys, F.pmod(salt, F.lit(n_salt)).alias("_salt")).agg(*partial_exprs)
    final = partial.groupBy(*keys).agg(*final_exprs)
    return final.select(*keys, *finish)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: Column,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    ``n_salt``× — exact same rows as ``big.join(small, on, how)`` (each big
    row meets exactly one replica of its matching small rows). ``how`` may
    be inner or left (the forms where every output row is anchored on one
    big-side row). The small side must be small enough to replicate S×, but
    NOT necessarily broadcastable — the win over broadcast is when small is
    tens of GB: replication cost is S× its size, while the hot key's probe
    stream splits S ways."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if "_salt" in big.columns or "_salt" in small.columns:
        raise ValueError(
            "salted_join reserves the column name '_salt'; rename it first"
        )
    # a NULL salt expression would give pmod(...)=NULL, matching NO replica
    # — those big rows would silently lose all matches, violating the
    # rows-equal contract; route them to bucket 0 instead
    b = big.withColumn("_salt", F.coalesce(F.pmod(salt, F.lit(n_salt)), F.lit(0)))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<bigint>"))
    )
    return b.join(s, on=on + ["_salt"], how=how).drop("_salt")


def key_skew_metrics(
    df: DataFrame, key: str, sample_mod: int | None = None,
    row_col: str | None = None,
) -> dict:
    """One-row skew readout for a prospective shuffle key: total rows,
    distinct keys, hottest key's row count and SHARE of all rows — the
    number that says whether one reducer partition will receive an
    outsized slice. Optionally measured on a deterministic 1/sample_mod
    ROW sample keyed on ``row_col`` (a row-unique id, REQUIRED with
    sampling): row sampling shrinks every key's count by the same
    factor, so shares stay unbiased and a hot key is always visible.
    (Key-level sampling would be wrong here: it drops the hot key
    entirely with probability 1-1/m, and inflates its share ~m-fold
    when kept.) The result is one row: a bounded, metadata-sized
    collect."""
    if sample_mod:
        if row_col is None:
            raise ValueError(
                "key_skew_metrics sampling needs row_col (a row-unique id): "
                "sampling on the key itself would drop whole keys and bias "
                "the share estimate"
            )
        df = df.filter(F.pmod(F.xxhash64(F.col(row_col)), F.lit(sample_mod)) == 0)
    per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("_n"))
    row = per_key.agg(
        F.sum("_n").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("_n").alias("max_per_key"),
    ).collect()[0]
    total = row["total"] or 0
    return {
        "total": total,
        "n_keys": row["n_keys"],
        "max_per_key": row["max_per_key"] or 0,
        "max_share": (row["max_per_key"] / total) if total else 0.0,
    }


def join_skew_aware(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: Column | None = None,
    n_salt: int = 16,
    max_share_threshold: float = 0.05,
    metrics: dict | None = None,
    how: str = "inner",
) -> tuple[DataFrame, dict]:
    """Measure-then-decide join: when the big side's hottest key holds
    more than ``max_share_threshold`` of its rows (one reducer would
    process that whole slice alone), switch to the salted replicated
    join; otherwise join plain and let AQE's skew-join splitting handle
    residual imbalance. Pass precomputed/persisted ``metrics`` (e.g.
    from a key_skew_metrics run over yesterday's snapshot) to skip the
    diagnostic pass. Returns (joined, decision_record) — the record is
    the audit line a pipeline logs next to its plan."""
    if metrics is None:
        metrics = key_skew_metrics(big, on[0])
    skewed = metrics["max_share"] > max_share_threshold
    if skewed:
        # default salt hashes the WHOLE row, never just the join key — a
        # key-only salt would map every row of the hot key to one salt
        # bucket and change nothing
        default_salt = F.xxhash64(*[F.col(c) for c in big.columns])
        out = salted_join(
            big, small, on,
            salt=salt if salt is not None else default_salt,
            n_salt=n_salt, how=how,
        )
    else:
        out = big.join(small, on=on, how=how)
    return out, {**metrics, "strategy": "salted" if skewed else "plain"}
