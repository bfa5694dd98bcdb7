"""Scalar-function surface.

The reference has a *generic passthrough*: any non-aggregate function call
plans as ``ScalarFunction {fun: UPPERCASED, args}`` with no registry, no
validation, no evaluation (reference src/planner/common.rs:56-59,
tmp/select.rs:583-611). Our equivalent passthrough is
``F.call_function(name, *args)`` — Spark's builtin registry supplies the
actual implementations, and unknown names fail at *analysis* time (an
improvement: the reference deferred failure forever, since it never
executed).

Aggregate detection in the reference is a name check against
{COUNT,SUM,MIN,MAX,AVG} (tmp/select.rs:431-432, common.rs:14-21); we expose
the same five plus the DISTINCT flag (common.rs:54).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: AggregateFunction enum (reference src/planner/common.rs:14-21).
AGGREGATE_FUNCTIONS = frozenset({"COUNT", "SUM", "MIN", "MAX", "AVG"})


def stable_round(col: Column, n: int) -> Column:
    """Engine-portable rounding: floor(x·10ⁿ + 0.5)/10ⁿ on doubles.

    Spark's ROUND goes through BigDecimal(Double.toString(x)) HALF_UP while
    DuckDB rounds the double numerically — on boundary representations
    (e.g. 27.657249999999997, shortest string "27.65725") the two disagree.
    This closed form uses only IEEE ops both engines execute identically,
    so equal input doubles always round equally. (Ties round toward +inf.)
    """
    scale = F.lit(float(10**n))
    return (F.floor(col * scale + F.lit(0.5))).cast("double") / scale


def mul_mod32(col: Column, mult: int) -> Column:
    """(col · mult) mod 2^32 without int64 overflow for ANY non-negative
    long key — the safe form of the Knuth-style multiplicative mixes used
    by hash split, Bloom positions, and sketch rows.

    The naive ``col * mult`` overflows (ANSI error) once col exceeds
    2^63 / mult ≈ 3.5e9 — squarely inside the id range of a 100 TB
    corpus (found by a hypothesis property test). Splitting the reduced
    key into 16-bit halves keeps every intermediate < 2^48:
    (k·m) mod 2^32 = (((hi·m) mod 2^16)·2^16 + lo·m) mod 2^32
    where k = hi·2^16 + lo, k = col mod 2^32. Bit-identical to the
    arbitrary-precision product mod 2^32 (property-tested)."""
    k = F.pmod(col.cast("long"), F.lit(1 << 32))
    hi = F.shiftright(k, 16)
    lo = k.bitwiseAND(F.lit((1 << 16) - 1))
    part = F.pmod(hi * F.lit(mult), F.lit(1 << 16)) * F.lit(1 << 16)
    return F.pmod(part + lo * F.lit(mult), F.lit(1 << 32))


def is_aggregate(name: str) -> bool:
    """Name-based aggregate detection (tmp/select.rs:431-432)."""
    return name.upper() in AGGREGATE_FUNCTIONS


def scalar_function(name: str, *args: Column | str) -> Column:
    """The ScalarFunction passthrough (tmp/select.rs:583-611): uppercase the
    name, pass the args through, resolve against the engine's registry."""
    cols = [F.col(a) if isinstance(a, str) else a for a in args]
    return F.call_function(name.upper(), *cols)


def aggregate_function(name: str, arg: Column | str | None = None, distinct: bool = False) -> Column:
    """The five reference aggregates incl. COUNT(*) wildcard handling
    (tmp/select.rs:539-582) and the distinct flag (common.rs:54)."""
    up = name.upper()
    if up not in AGGREGATE_FUNCTIONS:
        raise ValueError(f"Unknown aggregate function: {name}")
    if up == "COUNT" and arg is None:
        return F.count(F.lit(1))  # COUNT(*) via Wildcard arg (tmp/select.rs:557-559)
    col = F.col(arg) if isinstance(arg, str) else arg
    if distinct:
        fn = {
            "COUNT": F.count_distinct,
            "SUM": F.sum_distinct,
            # distinct is a no-op for MIN/MAX; AVG(DISTINCT) averages the
            # distinct values = sum_distinct / count_distinct
            "MIN": F.min,
            "MAX": F.max,
            "AVG": lambda c: F.sum_distinct(c) / F.count_distinct(c),
        }[up]
        return fn(col)
    return {"COUNT": F.count, "SUM": F.sum, "MIN": F.min, "MAX": F.max, "AVG": F.avg}[up](col)
