"""Run every catalog (query, oracle) pair through the local driver replica."""

from __future__ import annotations

import pytest

import queries_catalog as qc
from tests.oracle_harness import compare, duckdb_connection

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(qc.ORACLE_SQL))
def test_query_matches_oracle(spark, con, name):
    problems = compare(qc.SPARK_QUERIES[name](spark, SF), con, qc.ORACLE_SQL[name], name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", sorted(set(qc.SPARK_QUERIES) - set(qc.ORACLE_SQL)))
def test_rows_only_queries_run(spark, name):
    df = qc.SPARK_QUERIES[name](spark, SF)
    assert df.count() >= 0
    assert len(df.schema) > 0
