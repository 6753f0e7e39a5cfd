"""Run every registered query against its DuckDB oracle at sf0.001 —
the same gate the driver applies at sf0.01 (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from gisaid_pipeline_functions_spark import registry

from .oracle import compare, duckdb_conn

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        compare(df, con, ORACLES[name])
    else:
        # rows-only check for non-SQL-expressible ops (driver's weaker gate)
        rows = df.count()
        assert rows >= 0
        assert df.columns


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(QUERIES) >= set(ORACLES)
