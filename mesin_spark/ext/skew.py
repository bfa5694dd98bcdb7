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
    sum+count and finishes as their ratio (exact — same double division the
    one-phase avg performs). ``salt`` is any deterministic expression; it is
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
    b = big.withColumn("_salt", F.pmod(salt, F.lit(n_salt)))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<bigint>"))
    )
    return b.join(s, on=on + ["_salt"], how=how).drop("_salt")
