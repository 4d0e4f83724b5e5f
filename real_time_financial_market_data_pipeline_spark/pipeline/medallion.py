"""Medallion layers: bronze (raw + lineage) → silver (clean, deduped)
→ gold (OHLCV bars, see operators.ohlcv).

Capability parity: reference `src/consumer/transformations.py`
to_bronze (:90-107), to_silver (:114-137), clean_trades (:140-154).
The same functions serve batch and Structured Streaming inputs —
that unification is the point of building on DataFrames.

Storage layout at scale: bronze/silver partitioned by trade_date
(replacing the reference's Cassandra (symbol, date) partition key) so
date-ranged serving queries prune files; symbol stays a high-cardinality
in-file column with parquet min/max stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.operators.dedup import exact_dedup
from real_time_financial_market_data_pipeline_spark.pipeline.validate import FUTURE_TOLERANCE


def to_bronze(df: DataFrame, source: str = "feed") -> DataFrame:
    """Raw rows + lineage metadata (processed_at / processing_date / source)."""
    return (
        df.withColumn("processed_at", F.current_timestamp())
        .withColumn("processing_date", F.current_date())
        .withColumn("source", F.lit(source))
    )


def silver_filter(
    price_col: str = "price",
    volume_col: str = "volume",
    time_col: str = "event_time",
    now: Column | None = None,
) -> Column:
    """Quality predicate: positive price & volume, not in the future."""
    now = F.current_timestamp() if now is None else now
    return (
        (F.col(volume_col) > 0)
        & (F.col(price_col) > 0)
        & (F.col(time_col) <= now + F.expr(f"INTERVAL {FUTURE_TOLERANCE}"))
    )


def to_silver(
    df: DataFrame,
    dedup_keys: tuple[str, str] = ("symbol", "timestamp"),
    tiebreaker_col: str | None = None,
    now: Column | None = None,
) -> DataFrame:
    """Quality-filter then dedup on (symbol, timestamp).

    In streaming, apply withWatermark upstream and this becomes bounded
    stateful dedup (see streaming.jobs which uses
    dropDuplicatesWithinWatermark instead of the batch exact_dedup).
    """
    filtered = df.filter(silver_filter(now=now))
    return exact_dedup(filtered, list(dedup_keys), tiebreaker_col=tiebreaker_col)


def clean_trades(df: DataFrame, price_col: str = "price", volume_col: str = "volume") -> DataFrame:
    """Normalization pass: round price to 4 decimals, abs(volume)."""
    return df.withColumn(price_col, F.round(F.col(price_col), 4)).withColumn(
        volume_col, F.abs(F.col(volume_col))
    )
