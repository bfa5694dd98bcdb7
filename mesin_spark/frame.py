"""QueryBuilder — DataFrame composition in the reference's clause order.

The reference plans a SELECT as a fixed pipeline (tmp/select.rs:153-244):

    FROM -> WHERE -> GROUP BY/agg -> HAVING -> SELECT -> ORDER BY -> LIMIT/OFFSET

producing ``Limit(Sort(Projection(Filter(Aggregate(Filter(Join/Scan))))))``.
That is exactly the pre-optimization tree ``spark.sql`` builds, so this
builder is a thin, explicitly-ordered wrapper over DataFrame ops. Catalyst
then does what the reference never could: predicate pushdown, column
pruning, join selection/reordering, constant folding (SURVEY.md §4.2).

Semantics preserved from the reference:

- HAVING is a plain Filter above Aggregate with **no** aggregate-reference
  rewriting (tmp/select.rs:213-220) — the caller filters on output columns
  of the agg, same shape as ``df.groupBy(...).agg(...).filter(...)``.
- Implicit cross join: a comma-list FROM folds into cross joins
  (tmp/select.rs:294-303); later WHERE predicates let Catalyst turn
  filter-over-cross into a real join.
- Join trees are left-deep folds (tmp/select.rs:280-292); Catalyst may
  reorder — an improvement, not a divergence, since results are equal.
- Sort defaults: asc=True, nulls_first=False per SortExpr
  (reference src/planner/common.rs:29-34).
- LIMIT/OFFSET literals only (tmp/select.rs:473-489).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

JOIN_HOW = {
    # JoinType (reference src/planner/common.rs:82-89) → Spark how-string
    "inner": "inner",
    "left": "left",
    "right": "right",
    "full": "full",
    "cross": "cross",
    # extensions beyond the reference (needed for IN/EXISTS subqueries)
    "semi": "left_semi",
    "anti": "left_anti",
}


def sort_key(col: Column | str, asc: bool = True, nulls_first: bool = False) -> Column:
    """All four asc/nulls combinations, explicit (SURVEY.md §2.6).

    Reference defaults: asc=true, nulls_first=false (common.rs:29-34).
    Note Spark's ASC default is NULLS FIRST and DESC default is NULLS LAST —
    the reference's default differs, so we always spell it out.
    """
    c = F.col(col) if isinstance(col, str) else col
    if asc:
        return c.asc_nulls_first() if nulls_first else c.asc_nulls_last()
    return c.desc_nulls_first() if nulls_first else c.desc_nulls_last()


class QueryBuilder:
    """Compose a query in the reference's clause order.

    >>> q = (QueryBuilder.from_(lineitem.alias("l"))
    ...      .join(orders.alias("o"), F.col("l.l_orderkey") == F.col("o.o_orderkey"))
    ...      .where(F.col("l_quantity") > 10)
    ...      .group_by("l_returnflag")
    ...      .agg(F.sum("l_quantity").alias("sum_qty"))
    ...      .having(F.col("sum_qty") > 100)
    ...      .select("l_returnflag", "sum_qty")
    ...      .order_by(("sum_qty", False, False))
    ...      .limit(10))
    >>> df = q.to_df()
    """

    def __init__(self, df: DataFrame):
        self._df = df
        self._group: list[Column | str] | None = None
        self._group_consumed = False
        self._aggs: list[Column] | None = None
        self._projected = False

    # -- FROM --------------------------------------------------------------
    @classmethod
    def from_(cls, df: DataFrame, *more: DataFrame) -> "QueryBuilder":
        """FROM a [, b, c ...] — comma-list folds into cross joins with no
        constraint, exactly the reference's lowering (tmp/select.rs:294-303)."""
        for other in more:
            df = df.crossJoin(other)
        return cls(df)

    def join(
        self,
        other: DataFrame,
        on: Column | str | Sequence[str] | None = None,
        how: str = "inner",
    ) -> "QueryBuilder":
        spark_how = JOIN_HOW.get(how, how)
        if spark_how == "cross":
            # explicit CROSS JOIN allows no constraint (tmp/select.rs:444,468)
            if on is not None:
                raise ValueError("CROSS JOIN does not accept a join constraint")
            self._df = self._df.crossJoin(other)
        else:
            self._df = self._df.join(other, on=on, how=spark_how)
        return self

    def natural_join(self, other: DataFrame, how: str = "inner") -> "QueryBuilder":
        """NATURAL JOIN: equi-join on the intersection of column names —
        finishing the reference's todo! (tmp/select.rs:462-464)."""
        common = [c for c in self._df.columns if c in set(other.columns)]
        if not common:
            raise ValueError("NATURAL JOIN with no common columns")
        self._df = self._df.join(other, on=common, how=JOIN_HOW.get(how, how))
        return self

    # -- WHERE -------------------------------------------------------------
    def where(self, predicate: Column) -> "QueryBuilder":
        self._df = self._df.filter(predicate)
        return self

    # -- GROUP BY / aggregates --------------------------------------------
    def group_by(self, *exprs: Column | str) -> "QueryBuilder":
        self._group = list(exprs)
        return self

    def agg(self, *aggs: Column) -> "QueryBuilder":
        self._aggs = list(aggs)
        if self._group is not None:
            self._group_consumed = True
            self._df = self._df.groupBy(*self._group).agg(*aggs)
        else:
            # global aggregate: the reference can't reach this (Aggregate is
            # only created when GROUP BY is non-empty, tmp/select.rs:201-211);
            # we do it properly and document the divergence (SURVEY.md §2.4).
            self._df = self._df.agg(*aggs)
        return self

    # -- HAVING ------------------------------------------------------------
    def having(self, predicate: Column) -> "QueryBuilder":
        # plain Filter above Aggregate, no rewrite (tmp/select.rs:213-220)
        self._df = self._df.filter(predicate)
        return self

    # -- SELECT ------------------------------------------------------------
    def select(self, *exprs: Column | str) -> "QueryBuilder":
        self._apply_bare_group_by()
        if exprs:
            self._df = self._df.select(*exprs)
        self._projected = True
        return self

    def _apply_bare_group_by(self) -> None:
        """GROUP BY with no aggregate functions is SQL's distinct-by-group
        form — silently ignoring the clause would return duplicate rows.
        Applied lazily at SELECT/to_df so agg() can still consume the
        grouping first."""
        if self._group is not None and not self._group_consumed:
            self._group_consumed = True
            self._df = self._df.select(*self._group).distinct()

    # -- ORDER BY ----------------------------------------------------------
    def order_by(self, *keys) -> "QueryBuilder":
        """Each key: Column, column name, or (col, asc, nulls_first) tuple."""
        cols = []
        for k in keys:
            if isinstance(k, tuple):
                cols.append(sort_key(*k))
            else:
                cols.append(sort_key(k))
        self._df = self._df.orderBy(*cols)
        return self

    # -- LIMIT / OFFSET ----------------------------------------------------
    def limit(self, fetch: int | None = None, skip: int | None = None) -> "QueryBuilder":
        """LIMIT fetch OFFSET skip — literals only, like the reference
        (tmp/select.rs:473-489 errors on non-literal limits)."""
        for v in (fetch, skip):
            if v is not None and not isinstance(v, int):
                raise ValueError("LIMIT/OFFSET must be integer literals")
        if skip:
            self._df = self._df.offset(skip)
        if fetch is not None:
            self._df = self._df.limit(fetch)
        return self

    # -- terminal ----------------------------------------------------------
    # (to_df applies any unconsumed bare GROUP BY first — see select)
    def to_df(self) -> DataFrame:
        self._apply_bare_group_by()
        return self._df

    df = to_df
