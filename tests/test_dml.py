"""ALTER TABLE schema evolution on the managed-parquet tier (extension —
the reference rejects ALTER outright, src/planner/mod.rs:36)."""

from __future__ import annotations

import os
import tempfile

import pytest

from mesin_spark.catalog import CatalogError
from mesin_spark.dml import DdlSession
from tests.conftest import SF_DIR


@pytest.fixture()
def mt(spark):
    base = tempfile.mkdtemp(prefix="mesin_alter_")
    sess = DdlSession(spark, base_dir=base)
    return sess.import_parquet("alter_t", os.path.join(SF_DIR, "region.parquet"))


def test_alter_add_column_backfills_default(spark, mt):
    before = mt.df().count()
    mt.alter_add_column("tier", "VARCHAR", default="bronze")
    rows = mt.df().collect()
    assert len(rows) == before
    assert all(r.tier == "bronze" for r in rows)
    mt.alter_add_column("score", "DOUBLE")  # no default -> NULL
    assert all(r.score is None for r in mt.df().collect())


def test_alter_rename_and_drop(spark, mt):
    mt.alter_rename_column("r_name", "region_name")
    cols = mt.df().columns
    assert "region_name" in cols and "r_name" not in cols
    mt.alter_drop_column("region_name")
    assert "region_name" not in mt.df().columns


def test_alter_missing_column_raises(spark, mt):
    with pytest.raises(CatalogError, match="does not exist"):
        mt.alter_drop_column("nope")
    with pytest.raises(CatalogError, match="does not exist"):
        mt.alter_rename_column("nope", "x")


def test_alter_then_update_uses_new_schema(spark, mt):
    mt.alter_add_column("flag", "BOOLEAN", default=False)
    mt.update({"flag": "r_regionkey > 2"})
    got = {r.r_regionkey: r.flag for r in mt.df().collect()}
    assert got == {k: k > 2 for k in got}
