"""Set operations + VALUES — finishing the reference's explicit todo!()s.

Reference parity: SURVEY.md §2.7 — "Set operations (UNION, INTERSECT,
EXCEPT) are not supported yet" (tmp/select.rs:235-237); VALUES body likewise
(:238).
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

from mesin_spark.queries import T, query


def _hi_lo(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    hi = c.filter(F.col("c_acctbal") > 7000.0).select("c_custkey", "c_mktsegment")
    lo = c.filter(F.col("c_acctbal") < 3000.0).select("c_custkey", "c_mktsegment")
    return hi, lo


@query(
    "q_union_all",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 7000.0
    UNION ALL
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal < 3000.0
    """,
)
def q_union_all(spark, sf_dir):
    """UNION ALL = df.union (positional, like SQL). unionByName exists for
    the name-matched variant."""
    hi, lo = _hi_lo(spark, sf_dir)
    return hi.union(lo)


@query(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 5000.0
    UNION
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def q_union_distinct(spark, sf_dir):
    """UNION (distinct) = union + distinct; Catalyst plans one hash-dedup
    shuffle over the concatenation."""
    a = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000.0)
        .select(F.col("c_nationkey").alias("nk"))
    )
    b = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return a.union(b).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def q_intersect(spark, sf_dir):
    """INTERSECT (distinct semantics); intersectAll covers the ALL variant."""
    a = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    b = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return a.intersect(b)


@query(
    "q_except",
    oracle="""
    SELECT o_custkey AS ck FROM orders WHERE o_totalprice > 250000.0
    EXCEPT
    SELECT c_custkey AS ck FROM customer WHERE c_acctbal > 0.0
    """,
)
def q_except(spark, sf_dir):
    """EXCEPT (distinct semantics) = exceptAll∘distinct ≡ df.subtract... we
    use exceptAll on distinct input to match SQL EXCEPT exactly.

    Operands are big-ticket order custkeys minus positive-balance
    customers (11/122/1319 rows at sf 0.001/0.01/0.1): the original
    customer-nations EXCEPT supplier-nations form certified a vacuous
    empty result — the 25-value nation domain is fully covered by both
    sides at every SF above 0.001."""
    a = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000.0)
        .select(F.col("o_custkey").alias("ck"))
    )
    b = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0.0)
        .select(F.col("c_custkey").alias("ck"))
    )
    return a.distinct().exceptAll(b.distinct())


@query(
    "q_intersect_all",
    oracle="""
    SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 5000.0
    INTERSECT ALL
    SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 2000.0
    """,
)
def q_intersect_all(spark, sf_dir):
    """INTERSECT ALL (bag semantics — keeps min multiplicity per side)."""
    c = T(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 5000.0).select(F.col("c_nationkey").alias("nk"))
    b = c.filter(F.col("c_acctbal") > 2000.0).select(F.col("c_nationkey").alias("nk"))
    return a.intersectAll(b)


@query(
    "q_except_all",
    oracle="""
    SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 2000.0
    EXCEPT ALL
    SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 5000.0
    """,
)
def q_except_all(spark, sf_dir):
    """EXCEPT ALL (bag semantics — multiplicity subtraction)."""
    c = T(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 2000.0).select(F.col("c_nationkey").alias("nk"))
    b = c.filter(F.col("c_acctbal") > 5000.0).select(F.col("c_nationkey").alias("nk"))
    return a.exceptAll(b)


@query(
    "q_values",
    oracle="""
    SELECT * FROM (VALUES (1, 'one', 1.5), (2, 'two', 2.5), (3, 'three', CAST(NULL AS DOUBLE)))
      AS t(id, name, score)
    """,
)
def q_values(spark, sf_dir):
    """VALUES list as a query body — todo!() in the reference
    (tmp/select.rs:238); Spark: createDataFrame with an explicit schema
    (LocalRelation, no cluster work at all)."""
    schema = Ty.StructType(
        [
            Ty.StructField("id", Ty.IntegerType(), False),
            Ty.StructField("name", Ty.StringType(), False),
            Ty.StructField("score", Ty.DoubleType(), True),
        ]
    )
    rows = [Row(id=1, name="one", score=1.5), Row(id=2, name="two", score=2.5), Row(id=3, name="three", score=None)]
    return spark.createDataFrame(rows, schema)
