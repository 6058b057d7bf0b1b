"""Every declared query with an oracle must match DuckDB exactly —
the local mirror of the driver's correctness gate (sf set by
``TEST_ORACLE_SF_DIR``, default sf0.001 for speed; run sf0.01 before
milestones)."""

from __future__ import annotations

import pytest

from prueba_tecnica_analista_etl_spark.plans import REGISTRY

from tests.oracle_harness import compare, duckdb_con

ORACLE_QUERIES = sorted(
    name for name, spec in REGISTRY.items() if spec.oracle is not None
)
ROWS_ONLY = sorted(
    name for name, spec in REGISTRY.items() if spec.oracle is None
)


@pytest.fixture(scope="module")
def con(oracle_sf_dir):
    c = duckdb_con(oracle_sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, oracle_sf_dir, con, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, oracle_sf_dir)
    report = compare(df, con, spec.oracle)
    assert report["ok"], f"{name}: {report}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_nonempty(spark, oracle_sf_dir, name):
    df = REGISTRY[name].fn(spark, oracle_sf_dir)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"r_name", "revenue"}


def test_contract_shape():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 25
