"""Property-based differential test (SURVEY.md §5.2 item 4): random filter
predicates over lineitem compared Spark-vs-DuckDB. Hypothesis generates
the predicate space; both engines must return identical row sets."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mesin_spark.queries import T
from tests.conftest import SF_DIR

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_linenumber"]
OPS = ["<", "<=", ">", ">=", "="]


@st.composite
def predicates(draw):
    n = draw(st.integers(1, 3))
    parts = []
    for _ in range(n):
        col = draw(st.sampled_from(NUM_COLS))
        op = draw(st.sampled_from(OPS))
        if col == "l_linenumber":
            val = draw(st.integers(1, 7))
        elif col in ("l_discount", "l_tax"):
            val = round(draw(st.floats(0.0, 0.1, allow_nan=False)), 3)
        elif col == "l_quantity":
            val = round(draw(st.floats(1.0, 50.0, allow_nan=False)), 2)
        else:
            val = round(draw(st.floats(900.0, 100000.0, allow_nan=False)), 2)
        parts.append(f"{col} {op} {val}")
    glue = draw(st.sampled_from([" AND ", " OR "]))
    return glue.join(parts)


@given(pred=predicates())
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_random_filter_matches_duckdb(pred, spark, duck):
    sql = f"SELECT l_orderkey, l_linenumber FROM lineitem WHERE {pred}"
    got = {
        (r.l_orderkey, r.l_linenumber)
        for r in T(spark, SF_DIR, "lineitem")
        .filter(pred)
        .select("l_orderkey", "l_linenumber")
        .collect()
    }
    want = set(map(tuple, duck.execute(sql).fetchall()))
    assert got == want, f"predicate {pred!r}: {len(got)} vs {len(want)} rows"
