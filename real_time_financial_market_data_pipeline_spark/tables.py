"""Batch table loaders over the driver testdata (TESTDATA.md).

All loads go through `load_table` so the nanos-timestamp workaround and
column conventions live in exactly one place. Scans stay fully
declarative (spark.read.parquet + column expressions) so Catalyst gets
predicate pushdown / column pruning on every downstream query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.session import configure

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Type contract for the driver-testdata timestamp columns. The physical
# parquet type has varied across driver regenerations, so the loader accepts
# all three flavors and normalizes to session-local TimestampType (session tz
# is pinned UTC in session.RUNTIME_CONF, so every branch is value-preserving):
#   (a) INT64 TIMESTAMP(NANOS,false)  -> read as bigint via nanosAsLong,
#       converted with integer-div truncation to microseconds
#   (b) timestamp[us] without tz      -> read as TIMESTAMP_NTZ, cast to
#       TIMESTAMP (wall-clock reinterpreted as UTC — identical instants)
#   (c) timestamp[us] with tz (LTZ)   -> already TimestampType, pass-through
_TS_COLS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def _nanos_to_ts(df: DataFrame, cols: list[str]) -> DataFrame:
    dtypes = dict(df.dtypes)
    for c in cols:
        if c not in dtypes:
            continue
        if dtypes[c] == "bigint":
            # integer `div`, not `/`: double division loses low bits at
            # epoch-nanos magnitude (2^63 range vs double's 53-bit mantissa)
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtypes[c] == "timestamp_ntz":
            # UTC session tz makes NTZ->LTZ a pure reinterpretation
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _nanos_to_ts(df, _TS_COLS.get(name, []))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views for the SQL surface."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def trades_from_events(events: DataFrame) -> DataFrame:
    """Adapt the generic `events` stream table to the normalized trade shape
    (FIXTURES.md §2): symbol := event_type, price := value, volume := the
    numeric `k` field of the JSON props, event_time := ts.

    The JSON extraction is a JVM-side get_json_object — no UDF.
    """
    return events.select(
        F.col("event_type").alias("symbol"),
        F.col("value").alias("price"),
        F.get_json_object("props", "$.k").cast("long").alias("volume"),
        F.unix_millis(F.col("ts")).alias("timestamp"),
        F.col("ts").alias("event_time"),
        F.to_date("ts").alias("trade_date"),
        F.col("event_id"),
        F.col("user_id"),
    )
