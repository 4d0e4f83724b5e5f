"""Latest-value-per-key serving view with change-vs-previous.

Capability parity: the reference's `latest_prices` table
(`schemas/cassandra/keyspace.cql:132-141`) and upsert statement
(`src/storage/cassandra_client.py:105-114`) — declared but never
populated by its Spark job. Implemented here properly as a windowed
ranking over event time.

Scale: one shuffle on the symbol key; `row_number` over
(symbol → event_time desc) sorts within partitions only. Symbol
cardinality is the parallelism floor — for few-symbols/100 TB use the
aggregate variant `latest_prices_agg` (hash agg with map-side combine,
no per-key sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_prices(
    df: DataFrame,
    symbol_col: str = "symbol",
    price_col: str = "price",
    volume_col: str = "volume",
    time_col: str = "event_time",
    tiebreaker_col: str | None = None,
) -> DataFrame:
    """One row per symbol: last price/volume/time + change vs previous trade."""
    order = [F.col(time_col).desc()]
    if tiebreaker_col:
        order.append(F.col(tiebreaker_col).desc())
    w = Window.partitionBy(symbol_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_prev_price", F.lead(price_col).over(w))  # next row desc = previous trade
        .filter(F.col("_rn") == 1)
        .select(
            F.col(symbol_col).alias("symbol"),
            F.col(price_col).alias("last_price"),
            F.col(volume_col).alias("last_volume"),
            F.col(time_col).alias("last_trade_time"),
            (F.col(price_col) - F.col("_prev_price")).alias("price_change"),
            (100.0 * (F.col(price_col) - F.col("_prev_price")) / F.col("_prev_price")).alias(
                "price_change_pct"
            ),
        )
    )


def latest_prices_agg(
    df: DataFrame,
    symbol_col: str = "symbol",
    price_col: str = "price",
    volume_col: str = "volume",
    time_col: str = "event_time",
) -> DataFrame:
    """Aggregate formulation (no window sort): max_by for the latest values.

    Preferred at scale and in streaming (works as a streaming aggregate in
    update mode). No price_change (needs the second-latest row; see
    latest_prices).
    """
    ts = F.col(time_col)
    return df.groupBy(F.col(symbol_col).alias("symbol")).agg(
        F.max_by(F.col(price_col), ts).alias("last_price"),
        F.max_by(F.col(volume_col), ts).alias("last_volume"),
        F.max(ts).alias("last_trade_time"),
    )
