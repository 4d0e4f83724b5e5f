from __future__ import annotations

import pytest

from real_time_financial_market_data_pipeline_spark.engine import Engine
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark, SF_DIR)


def test_engine_surface(eng):
    assert eng.table("lineitem").count() == 6000
    assert eng.sql("SELECT count(*) AS n FROM trades_silver").collect()[0]["n"] > 0
    assert len(eng.serving("q8_latest_prices").collect()) == 5
    assert eng.query("pricing_summary").count() > 0
    assert "q5_latest_bars" in eng.serving_queries
    assert "ohlcv_5m" in eng.queries


def test_engine_unknown_names(eng):
    with pytest.raises(KeyError):
        eng.serving("nope")
    with pytest.raises(KeyError):
        eng.query("nope")
