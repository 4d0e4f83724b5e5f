"""Single-source-of-truth schemas.

The reference maintained the trade schema three times (Avro, Spark
StructType, CQL) with drift between them (reference:
src/consumer/transformations.py:25-44 vs schemas/avro/trade.avsc vs
schemas/cassandra/keyspace.cql — `conditions` string vs array, phantom
vwap/quality columns). Here one StructType per entity is the only
definition; everything else derives from it.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Wire-format trade as produced by the upstream feed (reference fixture shape:
# tests/conftest.py:29-39 — {"s","p","v","t","c"}).
TRADE_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("s", T.StringType(), False),
        T.StructField("p", T.DoubleType(), True),
        T.StructField("v", T.LongType(), True),
        T.StructField("t", T.LongType(), True),  # epoch ms (or s; normalized)
        T.StructField("c", T.ArrayType(T.StringType()), True),
        T.StructField("received_at", T.StringType(), True),
    ]
)

# Normalized trade (bronze/silver row shape; reference
# transformations.py:25-32 + derived event_time/trade_date :80-102).
TRADE_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("volume", T.LongType(), False),
        T.StructField("timestamp", T.LongType(), False),  # epoch ms
        T.StructField("conditions", T.ArrayType(T.StringType()), True),
        T.StructField("ingestion_time", T.LongType(), True),  # epoch ms
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("trade_date", T.DateType(), False),
    ]
)

# Quote (bid/ask) — declared surface in the reference (schemas/avro/quote.avsc),
# consumed here by the as-of join operator.
QUOTE_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("bid_price", T.DoubleType(), True),
        T.StructField("bid_size", T.LongType(), True),
        T.StructField("ask_price", T.DoubleType(), True),
        T.StructField("ask_size", T.LongType(), True),
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("ingestion_time", T.LongType(), True),
        T.StructField("event_time", T.TimestampType(), False),
    ]
)

# Gold OHLCV bar (reference keyspace.cql:77-97 incl. the vwap column the
# reference declared but never computed — we compute it).
OHLCV_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("window_start", T.TimestampType(), False),
        T.StructField("window_end", T.TimestampType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.LongType(), True),
        T.StructField("trade_count", T.LongType(), True),
        T.StructField("vwap", T.DoubleType(), True),
    ]
)

# Dead-letter record (reference pipeline.py:120-126: original + errors + ts).
DEAD_LETTER_SCHEMA = T.StructType(
    [
        T.StructField("original", T.StringType(), False),  # to_json of input row
        T.StructField("errors", T.ArrayType(T.StringType()), False),
        T.StructField("dead_lettered_at", T.TimestampType(), False),
    ]
)
