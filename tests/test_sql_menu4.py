"""Properties for the sql_menu4 tier. Exact oracle equality for the five
SQL-surface queries is covered by test_oracle.py; here we assert the
sketch properties that make q_hll_rollup trustworthy (it is rows-only by
design — DataSketches estimates have no DuckDB equivalent) and the
checks-suite semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_hll_estimate_accuracy(spark):
    import __spark_entry__ as E

    rows = E.queries()["q_hll_rollup"](spark, SF_DIR).collect()
    from mesin_spark.queries import T

    ev = T(spark, SF_DIR, "events")
    exact = {
        r["week_ts"]: r["n"]
        for r in ev.groupBy(
            F.unix_timestamp(F.date_trunc("week", "ts")).alias("week_ts")
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert {r["week_ts"] for r in rows} == set(exact)
    for r in rows:
        # ~150 users/week is deep in HLL's near-exact regime (lgk=12)
        assert abs(r["users_est"] - exact[r["week_ts"]]) <= max(
            2, 0.02 * exact[r["week_ts"]]
        )


def test_hll_merge_matches_direct_sketch(spark):
    """Merging daily sketch partials must estimate like sketching the week
    directly — the property that makes the rollup re-aggregable."""
    from mesin_spark.queries import T

    ev = T(spark, SF_DIR, "events")
    wk = F.date_trunc("week", "ts").alias("wk")
    direct = {
        r["wk"]: r["est"]
        for r in ev.groupBy(wk)
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    merged = {
        r["wk"]: r["est"]
        for r in ev.groupBy(wk, F.date_trunc("day", "ts").alias("d"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("wk")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    assert set(direct) == set(merged)
    for k in direct:
        assert abs(direct[k] - merged[k]) <= max(2, 0.02 * direct[k])


def test_quality_checks_all_pass_on_clean_table(spark):
    import __spark_entry__ as E

    rows = E.queries()["q_quality_checks"](spark, SF_DIR).collect()
    assert len(rows) == 5
    assert all(r["passed"] for r in rows)
    by_name = {r["check_name"]: r["metric"] for r in rows}
    assert by_name["completeness_custkey"] == 1.0
    assert by_name["uniqueness_orderkey"] == 1.0


def test_udtf_split_reconstructs_sentences(spark):
    import __spark_entry__ as E

    rows = E.queries()["q_udtf_split"](spark, SF_DIR).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        assert r["n_tokens"] >= 1
        assert r["part"].strip() == r["part"]
        by_doc.setdefault(r["doc_id"], []).append(r)
    for parts in by_doc.values():
        nos = sorted(p["part_no"] for p in parts)
        assert nos == list(range(1, len(parts) + 1))
