"""OHLCV windowed aggregation — the engine's core operator.

Capability parity: reference `src/consumer/transformations.py:161-204`
(groupBy(symbol, window) with first/last/max/min/sum/count) plus the
`vwap` column the reference declared in its gold schema
(`schemas/cassandra/keyspace.cql:88`) but never computed.

Spark-first design decisions:
- `F.window` tumbling/sliding windows → works identically in batch and
  Structured Streaming (one code path for both).
- Deterministic open/close via `min_by`/`max_by` on an (event_time,
  tiebreaker) ordering key instead of the reference's arrival-order
  `first`/`last` — a documented semantic *fix*: streaming `first()` is
  nondeterministic under retries/reordering, `min_by` is not.
- Single hash aggregate: one shuffle on (symbol, window), partial
  aggregation map-side. At 100 TB the shuffle keys are (symbol, window)
  — high cardinality, well distributed; no skew salting needed unless a
  single symbol dominates a window, in which case AQE skew handling
  applies (aggregates are two-phase anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ohlcv(
    df: DataFrame,
    window_duration: str = "5 minutes",
    slide: str | None = None,
    symbol_col: str = "symbol",
    price_col: str = "price",
    volume_col: str = "volume",
    time_col: str = "event_time",
    tiebreaker_col: str | None = None,
    vwap_price_scale: int | None = None,
) -> DataFrame:
    """Per-(symbol, time-window) OHLCV + vwap bars.

    `tiebreaker_col` resolves open/close when two trades share an exact
    event_time (a stable unique id); without it, ties fall back to
    event_time ordering alone.

    `vwap_price_scale` (e.g. 100 for 2-decimal prices): accumulate
    price*volume in exact scaled integers (decimal sum) instead of
    floating point. Float sums are accumulation-order dependent — two
    runs (or two engines) can disagree in the last ulp; decimal-cents
    accumulation is the financial-grade deterministic form.
    """
    price = F.col(price_col)
    vol = F.col(volume_col)
    if tiebreaker_col:
        order_key: Column = F.struct(F.col(time_col), F.col(tiebreaker_col))
    else:
        order_key = F.col(time_col)

    win = (
        F.window(time_col, window_duration, slide)
        if slide
        else F.window(time_col, window_duration)
    )

    if vwap_price_scale is None:
        vwap = F.sum(price * vol) / F.sum(vol)
    else:
        # exact integer accumulation + ONE IEEE-754 division → the result
        # is bit-deterministic (identical on any engine/partitioning);
        # avoid post-rounding, whose half-boundary behavior differs
        # between engines
        scaled = F.round(price * vwap_price_scale).cast("decimal(38,0)")
        vwap = F.sum(scaled * vol).cast("double") / (
            F.lit(vwap_price_scale).cast("long") * F.sum(vol)
        ).cast("double")

    return (
        df.groupBy(F.col(symbol_col).alias("symbol"), win.alias("w"))
        .agg(
            F.min_by(price, order_key).alias("open"),
            F.max(price).alias("high"),
            F.min(price).alias("low"),
            F.max_by(price, order_key).alias("close"),
            F.sum(vol).alias("volume"),
            F.count(F.lit(1)).alias("trade_count"),
            vwap.alias("vwap"),
        )
        .select(
            "symbol",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "open",
            "high",
            "low",
            "close",
            "volume",
            "trade_count",
            "vwap",
        )
    )


def ohlcv_5m(df: DataFrame, **kw) -> DataFrame:
    return ohlcv(df, "5 minutes", **kw)


def ohlcv_1h(df: DataFrame, **kw) -> DataFrame:
    return ohlcv(df, "1 hour", **kw)
