"""Stream-stream joins with watermark-bounded state.

Capability parity: the reference registers a quote schema and topic
(schemas/avro/quote.avsc, quotes_raw) but never consumes it — SURVEY
§2.5 marks trades⋈quotes as the natural join the data model sets up.

Design: equi-join on symbol + event-time interval condition. BOTH sides
carry watermarks and the join condition bounds the time skew, so
Spark's state store evicts rows once the watermark passes —
bounded state regardless of stream length (the requirement for an
unbounded 100 TB/day feed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trades_with_quotes(
    trades: DataFrame,
    quotes: DataFrame,
    watermark: str = "10 minutes",
    max_quote_age: str = "5 minutes",
) -> DataFrame:
    """Each trade joined to quotes within (trade_time - max_quote_age,
    trade_time]. Emits one row per matching quote; downstream can reduce
    to best/latest quote per trade with a grouped max_by.

    Works identically on batch DataFrames (no watermark needed) and
    streams (watermark bounds join state).

    The equi-key is (symbol, time-bucket), not symbol alone.  With a
    handful of hot symbols, a symbol-only key makes the symmetric hash
    join scan EVERY buffered quote for the symbol per incoming trade
    (measured ~1 ms/row of state-update time at sf0.1 — the classic
    low-cardinality interval-join blowup, and at 100 TB a scan linear
    in per-symbol quote rate).  Bucketing by `max_quote_age` bounds the
    scan to one bucket's occupancy: a quote at time q only matches
    trades in bucket(q) or bucket(q)+1, so the quote side is exploded
    into those two bucket keys (each matching pair still emits exactly
    once — its bucket(t) is unique), and the original interval predicate
    keeps exactness.  State doubles in rows (two quote copies) and the
    per-row scan drops from |quotes-per-symbol-in-state| to
    |quotes-per-symbol-per-bucket| — skew-proof by construction.
    """
    # interval length in ms as a constant-folded, tz-independent expr
    age_ms = F.unix_millis(F.timestamp_millis(F.lit(0)) + F.expr(f"INTERVAL {max_quote_age}"))

    t = trades
    if trades.isStreaming:
        t = t.withWatermark("event_time", watermark)
    t = t.withColumn("_jbucket", F.floor(F.unix_millis(F.col("event_time")) / age_ms)).alias("t")

    q = quotes
    if quotes.isStreaming:
        q = q.withWatermark("event_time", watermark)
    q = q.withColumn(
        "_jbucket",
        F.explode(
            F.array(
                F.floor(F.unix_millis(F.col("event_time")) / age_ms),
                F.floor(F.unix_millis(F.col("event_time")) / age_ms) + 1,
            )
        ),
    ).alias("q")

    cond = (
        (F.col("t.symbol") == F.col("q.symbol"))
        & (F.col("t._jbucket") == F.col("q._jbucket"))
        & (F.col("q.event_time") <= F.col("t.event_time"))
        & (F.col("q.event_time") > F.col("t.event_time") - F.expr(f"INTERVAL {max_quote_age}"))
    )
    return t.join(q, cond, "inner").select(
        F.col("t.symbol").alias("symbol"),
        F.col("t.event_time").alias("trade_time"),
        F.col("t.price").alias("price"),
        F.col("t.volume").alias("volume"),
        F.col("q.event_time").alias("quote_time"),
        F.col("q.bid_price").alias("bid_price"),
        F.col("q.ask_price").alias("ask_price"),
        (F.col("t.price") - (F.col("q.bid_price") + F.col("q.ask_price")) / 2).alias(
            "price_vs_mid"
        ),
    )


def best_quote_per_trade(joined: DataFrame) -> DataFrame:
    """Reduce the interval join's fan-out to the latest quote per trade
    (aggregate form — streaming-safe in append mode after watermark)."""
    return joined.groupBy("symbol", "trade_time", "price", "volume").agg(
        F.max_by(F.struct("quote_time", "bid_price", "ask_price", "price_vs_mid"),
                 F.col("quote_time")).alias("_q")
    ).select(
        "symbol",
        "trade_time",
        "price",
        "volume",
        F.col("_q.quote_time").alias("quote_time"),
        F.col("_q.bid_price").alias("bid_price"),
        F.col("_q.ask_price").alias("ask_price"),
        F.col("_q.price_vs_mid").alias("price_vs_mid"),
    )
