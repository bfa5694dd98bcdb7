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


@given(pred=predicates(), key=st.sampled_from(["l_returnflag", "l_linestatus", "l_linenumber"]))
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_random_filtered_agg_matches_duckdb(pred, key, spark, duck):
    """Filter + groupBy + count/sum must agree (integer sums — exact)."""
    from pyspark.sql import functions as F

    sql = (
        f"SELECT {key} AS k, count(*) AS n, CAST(sum(l_linenumber) AS BIGINT) AS s "
        f"FROM lineitem WHERE {pred} GROUP BY 1"
    )
    got = {
        (r.k, r.n, r.s)
        for r in T(spark, SF_DIR, "lineitem")
        .filter(pred)
        .groupBy(F.col(key).alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_linenumber").cast("bigint").alias("s"),
        )
        .collect()
    }
    want = set(map(tuple, duck.execute(sql).fetchall()))
    assert got == want, f"predicate {pred!r} key {key}"


@given(pred=predicates(), how=st.sampled_from(["inner", "left_semi", "left_anti"]))
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_random_filtered_join_matches_duckdb(pred, how, spark, duck):
    """lineitem (filtered) joined to orders — inner/semi/anti row sets
    must agree with DuckDB's equivalents."""
    from pyspark.sql import functions as F

    li = T(spark, SF_DIR, "lineitem").filter(pred)
    od = T(spark, SF_DIR, "orders").filter("o_totalprice > 50000")
    joined = li.join(od, li.l_orderkey == od.o_orderkey, how)
    got_cols = (
        ["l_orderkey", "l_linenumber"]
    )
    got = {tuple(r) for r in joined.select(*got_cols).collect()}
    if how == "inner":
        sql = (
            f"SELECT l_orderkey, l_linenumber FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            f"WHERE ({pred}) AND o_totalprice > 50000"
        )
    elif how == "left_semi":
        sql = (
            f"SELECT l_orderkey, l_linenumber FROM lineitem WHERE ({pred}) AND l_orderkey IN "
            f"(SELECT o_orderkey FROM orders WHERE o_totalprice > 50000)"
        )
    else:
        sql = (
            f"SELECT l_orderkey, l_linenumber FROM lineitem WHERE ({pred}) AND l_orderkey NOT IN "
            f"(SELECT o_orderkey FROM orders WHERE o_totalprice > 50000)"
        )
    want = set(map(tuple, duck.execute(sql).fetchall()))
    assert got == want, f"predicate {pred!r} how {how}"


# -- portable bit arithmetic vs pure-Python reference ----------------------
@given(pairs=st.lists(st.tuples(st.integers(0, 1023), st.integers(0, 1023)), min_size=1, max_size=30))
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_zorder_matches_python_reference(pairs, spark):
    from mesin_spark.sources import zorder_key

    def py_z(x, y, bits=10):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    from pyspark.sql import functions as F

    df = spark.createDataFrame(pairs, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", zorder_key(["x", "y"], bits=10)).collect()
    }
    for x, y in pairs:
        assert got[(x, y)] == py_z(x, y)


@given(keys=st.lists(st.integers(0, 2**40), min_size=1, max_size=30))
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_bloom_positions_match_python_reference(keys, spark):
    from pyspark.sql import functions as F

    from mesin_spark.ext.dedup import BLOOM_SALTS, bloom_positions

    m, k = 4096, 3
    df = spark.createDataFrame([(x,) for x in keys], "key long")
    got = {
        r.key: (r.p0, r.p1, r.p2)
        for r in df.select(
            "key",
            *[p.alias(f"p{j}") for j, p in enumerate(bloom_positions("key", m, k))],
        ).collect()
    }
    for x in set(keys):
        expect = tuple(((x * BLOOM_SALTS[j]) % (1 << 32)) % m for j in range(k))
        assert got[x] == expect


@given(keys=st.lists(st.integers(0, 2**62), min_size=1, max_size=30))
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_split_bucket_matches_python_reference(keys, spark):
    from mesin_spark.ext.pipeline import _KNUTH, split_bucket

    df = spark.createDataFrame([(x,) for x in keys], "key long")
    got = {r.key: r.b for r in df.select("key", split_bucket("key").alias("b")).collect()}
    for x in set(keys):
        assert got[x] == ((x * _KNUTH) % (1 << 32)) % 10000
