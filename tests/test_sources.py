"""Source/sink round-trips: CSV/JSON/ORC readers, the ns-timestamp-safe
parquet reader, and the layout-controlled parquet sink (partitioning for
partition pruning, sort-within-partitions for row-group pruning)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mesin_spark import sources as SRC
from mesin_spark.queries import T
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def nation(spark):
    return T(spark, SF_DIR, "nation")


def test_csv_round_trip(spark, nation, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("csv") / "nation")
    nation.write.mode("overwrite").option("header", "true").csv(path)
    back = SRC.read_csv(spark, path, schema=nation.schema)
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in nation.collect()
    )


def test_json_round_trip(spark, nation, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("json") / "nation")
    nation.write.mode("overwrite").json(path)
    back = SRC.read_json(spark, path, schema=nation.schema)
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)


def test_orc_round_trip(spark, nation, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("orc") / "nation")
    nation.write.mode("overwrite").orc(path)
    back = SRC.read_orc(spark, path)
    assert back.count() == nation.count()


def test_parquet_ns_timestamp_reader(spark):
    ev = SRC.read_parquet(spark, os.path.join(SF_DIR, "events.parquet"))
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.count() > 0


def test_bucketed_join_skips_shuffle(spark):
    li = T(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    od = T(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    SRC.write_bucketed(li, "t_li_bkt", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"])
    SRC.write_bucketed(od, "t_od_bkt", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a merge join so the assertion is about shuffle elimination
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_li_bkt").join(
            spark.table("t_od_bkt"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() == li.join(od, F.col("l_orderkey") == F.col("o_orderkey")).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_li_bkt")
        spark.sql("DROP TABLE IF EXISTS t_od_bkt")


def test_compact_parquet_merges_small_files(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("compact") / "li")
    li = T(spark, SF_DIR, "lineitem")
    li.repartition(64).write.parquet(path)  # simulate a small-files mess
    import glob

    assert len(glob.glob(f"{path}/*.parquet")) == 64
    before = li.count()
    SRC.compact_parquet(spark, path, target_file_mb=256, sort_by=["l_orderkey"])
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) <= 4
    assert spark.read.parquet(path).count() == before


def test_write_parquet_partitioned_prunes(spark, nation, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pq") / "nation_part")
    SRC.write_parquet(nation, path, partition_by=["n_regionkey"], sort_by=["n_name"])
    back = spark.read.parquet(path).filter(F.col("n_regionkey") == 2)
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune at scan, not post-filter
    assert "PartitionFilters: [" in plan and "n_regionkey" in plan.split("PartitionFilters")[1][:200]
    assert back.count() == nation.filter(F.col("n_regionkey") == 2).count()


def test_ns_reader_restores_session_conf(spark):
    # the legacy nanosAsLong conf must not leak: a later plain
    # spark.read.parquet in the same session keeps its normal behavior
    from mesin_spark.sources import read_parquet

    key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(key, None)
    df = read_parquet(spark, f"{SF_DIR}/events.parquet")
    assert spark.conf.get(key, None) == before
    # and the returned frame still executes with converted µs timestamps
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() > 0


def test_zorder_key_exact_interleave(spark):
    df = spark.createDataFrame([(3, 1), (0, 3), (5, 5)], "x long, y long")
    out = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", SRC.zorder_key(["x", "y"], bits=4)).collect()
    }
    # x bits land at even positions, y bits at odd: z(3,1)=0b111=7,
    # z(0,3)=0b1010=10, z(5,5)=0b110011=51
    assert out == {(3, 1): 7, (0, 3): 10, (5, 5): 51}


def test_zorder_sort_clusters_both_dims(spark):
    # on a 32x32 grid, walking in z order must stay closer in (x, y) than
    # walking in plain x-major order stays in y — the pruning property
    grid = spark.range(1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    rows = (
        grid.withColumn("z", SRC.zorder_key(["x", "y"], bits=5))
        .orderBy("z")
        .collect()
    )

    def max_bbox_side(ordered, block=64):
        # worst bounding-box side over contiguous 'row groups' — what
        # min/max pruning actually sees
        worst = 0
        for i in range(0, len(ordered), block):
            blk = ordered[i : i + block]
            worst = max(
                worst,
                max(r.x for r in blk) - min(r.x for r in blk),
                max(r.y for r in blk) - min(r.y for r in blk),
            )
        return worst

    xmajor = sorted(rows, key=lambda r: (r.x, r.y))
    # z order: every 64-row block is an 8x8 tile (side 7); x-major blocks
    # span the full y range (side 31) — pruning works on BOTH dims only
    # under the z sort
    assert max_bbox_side(rows) == 7
    assert max_bbox_side(xmajor) == 31
