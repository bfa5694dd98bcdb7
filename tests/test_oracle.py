"""Oracle-differential tests — every registry query vs DuckDB at sf0.001
(the driver runs the same comparison at sf0.01; exact-match here is
strictly stronger than its order-insensitive value hash)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tools.verify_oracle import compare


def _registry():
    import __spark_entry__ as E

    return E.queries(), E.oracle_sql()

QUERIES, ORACLES = _registry()


def _assert_scalar_schema(name, df):
    """Governance: NO registry query may emit a container-typed column.
    The driver's pandas canonicalizer lexsorts every output column —
    rows-only included — and a list/dict/ndarray cell raises
    ``unhashable type`` there (the r07 q_image_dedup / q_image_jpeg /
    q_bpe_encode reds). Stringify with array_join / to_json instead."""
    from pyspark.sql import types as ST

    bad = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, (ST.ArrayType, ST.MapType, ST.StructType))
    ]
    assert not bad, f"{name}: container-typed output column(s) {bad}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    _assert_scalar_schema(name, sdf)
    spdf = sdf.toPandas()
    dpdf = duck.execute(ORACLES[name]).df()
    problems = compare(spdf, dpdf)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    _assert_scalar_schema(name, df)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as E

    rows = E.entry(spark).collect()
    assert len(rows) > 0
    assert {"l_returnflag", "sum_qty", "count_order"} <= set(rows[0].asDict())
