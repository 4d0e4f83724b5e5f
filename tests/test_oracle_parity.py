"""Differential test of every oracle-backed query vs DuckDB at sf0.001
(the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from real_time_financial_market_data_pipeline_spark.serving.queries import ORACLE_SQL, QUERIES
from tests.conftest import SF_DIR
from tests.oracle_harness import compare, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    problems = compare(df, duck, ORACLE_SQL[name])
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE_SQL)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
