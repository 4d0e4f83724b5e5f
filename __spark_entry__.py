"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (5-minute OHLCV gold bars from the
                events stream adapted to the trade shape) at sf0.001.
queries()     — every implemented operator from SURVEY.md §2 +
                the LLM-data-pipeline extensions, keyed by name.
oracle_sql()  — DuckDB-equivalent SQL per query where the semantics
                are ANSI-SQL-expressible (LSH/simhash/langid entries
                are rows-only checked by design).

Implementation lives in real_time_financial_market_data_pipeline_spark/; this module is the thin
driver-facing surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_financial_market_data_pipeline_spark.serving.queries import ORACLE_SQL, QUERIES

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["ohlcv_5m"](spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
