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


def test_hll_portable_accuracy_and_merge(spark):
    """The portable HLL must (a) estimate weekly uniques within sketch
    tolerance of the truth, and (b) be mergeable: registers of the full
    week equal the elementwise max of its daily partials' registers —
    the property that makes any HLL re-aggregable without raw rescans."""
    import __spark_entry__ as E
    from mesin_spark.ext.sketches import hll_portable
    from mesin_spark.queries import T

    rows = E.queries()["q_hll_portable"](spark, SF_DIR).collect()
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
        # m=64 raw HLL: ~13% relative error; linear counting is tighter
        # in the small-range regime this fixture sits in
        assert abs(r["users_est"] - exact[r["week_ts"]]) <= max(
            5, 0.25 * exact[r["week_ts"]]
        )

    wk = F.date_trunc("week", "ts").alias("wk")
    d = F.date_trunc("day", "ts").alias("d")
    full = {
        (r["wk"], r["_b"]): r["_reg"]
        for r in ev.select(wk, "user_id")
        .transform(lambda x: _portable_regs(x))
        .collect()
    }
    daily = ev.select(wk, d, "user_id").transform(
        lambda x: _portable_regs(x, ["wk", "d"])
    )
    merged = {}
    for r in daily.collect():
        k = (r["wk"], r["_b"])
        merged[k] = max(merged.get(k, 0), r["_reg"])
    assert merged == full


def _portable_regs(df, group_cols=("wk",)):
    """Raw (group, bucket, max-rank) registers from the SHIPPED register
    stage (sketches.hll_portable_registers) — the merge test must cover
    the production arithmetic, not a private copy that can drift."""
    from mesin_spark.ext.sketches import hll_portable_registers

    return hll_portable_registers(df, "user_id", list(group_cols))


def test_hll_portable_big_and_string_keys(spark):
    """Overflow + type guards on the portable HLL: keys past the int64
    multiply bound (~3.5e9, inside a 100 TB id range) must hash cleanly
    (mod-P reduction before the multiply), and string keys must route
    through the polynomial fingerprint instead of a nulling long cast."""
    from mesin_spark.ext.sketches import hll_portable

    big = spark.createDataFrame(
        [(1, 4_000_000_000 + i * 987_654_321) for i in range(200)],
        "g long, k long",
    )
    row = hll_portable(big, "k", ["g"]).collect()[0]
    assert row["n_hit"] > 0 and row["users_est"] > 50  # sane, not corrupt
    assert all(int(x) >= 0 for x in row["reg_csv"].split(","))

    strs = spark.createDataFrame(
        [(1, f"user-{i}") for i in range(300)], "g long, k string"
    )
    srow = hll_portable(strs, "k", ["g"]).collect()[0]
    assert srow["n_hit"] > 30  # spread across buckets, not one null bucket
    assert 150 <= srow["users_est"] <= 600  # ~300 within sketch tolerance


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
