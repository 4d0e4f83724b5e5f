"""User-facing facade: one object giving a reference user everything
their old stack answered — tables, medallion views, the serving query
set, the named operator queries, and free-form SQL.

    from real_time_financial_market_data_pipeline_spark.engine import Engine
    eng = Engine.local(sf_dir="/root/testdata/sf0.01")
    eng.serving("q6_volume_by_symbol").show()
    eng.sql("SELECT count(*) FROM trades_silver").show()
    eng.query("ohlcv_5m").show()
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from real_time_financial_market_data_pipeline_spark.serving.queries import QUERIES
from real_time_financial_market_data_pipeline_spark.serving.views import SERVING_SQL, register_market_views
from real_time_financial_market_data_pipeline_spark.session import configure, get_spark
from real_time_financial_market_data_pipeline_spark.tables import load_table


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str) -> None:
        self.spark = configure(spark)
        self.sf_dir = sf_dir
        self._views_registered = False

    @classmethod
    def local(cls, sf_dir: str, **spark_kwargs) -> "Engine":
        return cls(get_spark(**spark_kwargs), sf_dir)

    def _ensure_views(self) -> None:
        if not self._views_registered:
            register_market_views(self.spark, self.sf_dir)
            self._views_registered = True

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    def sql(self, statement: str) -> DataFrame:
        self._ensure_views()
        return self.spark.sql(statement)

    def serving(self, name: str) -> DataFrame:
        """One of the reference's dashboard/client queries (Q1-Q10)."""
        self._ensure_views()
        return self.spark.sql(SERVING_SQL[name])

    def query(self, name: str) -> DataFrame:
        """One of the engine's named operator queries (SURVEY §2 surface)."""
        return QUERIES[name](self.spark, self.sf_dir)

    @property
    def serving_queries(self) -> list[str]:
        return sorted(SERVING_SQL)

    @property
    def queries(self) -> list[str]:
        return sorted(QUERIES)
