"""Streaming sources, all normalizing to the same trade DataFrame shape
so the downstream pipeline is source-agnostic.

Capability parity: reference S1 (Kafka scan, src/consumer/
spark_processor.py:116-133), S2 (WebSocket feed — replaced by the
file/rate test sources per SURVEY §2.1), P1/P2 (JSON parse + epoch-ms
normalization, src/consumer/transformations.py:51-83).

The JSON wire format is the Finnhub-style {"s","p","v","t","c"} record
(FIXTURES.md §1). Parsing happens with from_json against the declared
schema — schema-on-read, no inference, same in batch and streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.functions.timeutils import epoch_ms_to_timestamp, normalize_epoch_ms
from real_time_financial_market_data_pipeline_spark.schemas import TRADE_WIRE_SCHEMA

QUOTE_WIRE_DDL = (
    "symbol string, bid_price double, bid_size long, "
    "ask_price double, ask_size long, timestamp long"
)


def _normalize_wire(parsed: DataFrame) -> DataFrame:
    """Wire record → normalized trade columns (symbol/price/volume/
    timestamp/conditions/event_time/trade_date)."""
    t_ms = normalize_epoch_ms(F.col("t"))
    return parsed.select(
        F.col("s").alias("symbol"),
        F.col("p").alias("price"),
        F.col("v").alias("volume"),
        t_ms.alias("timestamp"),
        F.coalesce(F.col("c"), F.array().cast("array<string>")).alias("conditions"),
        epoch_ms_to_timestamp(t_ms).alias("event_time"),
        F.to_date(epoch_ms_to_timestamp(t_ms)).alias("trade_date"),
    )


def read_trade_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming source over a directory of JSON-lines trade
    files (the test stand-in for the Kafka topic; identical downstream
    plan)."""
    reader = spark.readStream.schema(TRADE_WIRE_SCHEMA).format("json")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _normalize_wire(reader.load(path))


def read_quote_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based quote stream (bid/ask wire format, FIXTURES.md §3)."""
    reader = spark.readStream.schema(QUOTE_WIRE_DDL).format("json")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(path)
    t_ms = normalize_epoch_ms(F.col("timestamp"))
    return raw.select(
        "symbol",
        "bid_price",
        "bid_size",
        "ask_price",
        "ask_size",
        t_ms.alias("timestamp"),
        epoch_ms_to_timestamp(t_ms).alias("event_time"),
    )


def kafka_trade_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka source (value = JSON wire record). Matches reference S1
    semantics: failOnDataLoss=false, offset-controlled replay (ST9).
    Requires the spark-sql-kafka package on the classpath — unavailable
    in the test container, exercised structurally only.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
        .load()
    )
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), TRADE_WIRE_SCHEMA).alias("trade")
    ).select("trade.*")
    return _normalize_wire(parsed)


def socket_trade_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """TCP socket source: one JSON wire record per line — the closest
    built-in stand-in for the reference's WebSocket feed (S2,
    src/producer/finnhub_client.py): a push-based line protocol carrying
    the same {"s","p","v","t","c"} records.  The WS-specific connection
    lifecycle (exponential-backoff reconnect, subscription cap —
    finnhub_client.py:121-133) lives in sources/bridge.py (FeedBridge /
    ReconnectPolicy), which pumps any push transport into spool files
    for the exactly-once FILE source; this raw socket source remains
    the minimal direct tap for anything speaking line-JSON over TCP.

    The socket source is not replayable and keeps no offsets — dev/test
    only (same caveat Spark's docs attach); production ingest is the
    Kafka source (S1).
    """
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    parsed = raw.select(
        F.from_json(F.col("value"), TRADE_WIRE_SCHEMA).alias("trade")
    ).select("trade.*")
    return _normalize_wire(parsed)


def union_trade_streams(*streams: DataFrame) -> DataFrame:
    """Merge multiple normalized trade feeds (e.g. equities + crypto —
    the reference's trades_raw + crypto_raw topics) into one stream.
    unionByName keeps it schema-safe; downstream medallion code is
    source-count agnostic."""
    if not streams:
        raise ValueError("at least one stream required")
    out = streams[0]
    for s in streams[1:]:
        out = out.unionByName(s)
    return out


def rate_trade_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic trade stream off the built-in rate source (load/perf
    testing without external systems)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    symbols = F.array(*[F.lit(s) for s in ["AAPL", "GOOGL", "MSFT", "AMZN", "TSLA"]])
    return rate.select(
        F.element_at(symbols, (F.col("value") % 5 + 1).cast("int")).alias("symbol"),
        (100.0 + F.pmod(F.col("value") * 7919, F.lit(10000)) / 100.0).alias("price"),
        (F.pmod(F.col("value") * 104729, F.lit(1000)) + 1).alias("volume"),
        F.unix_millis(F.col("timestamp")).alias("timestamp"),
        F.array().cast("array<string>").alias("conditions"),
        F.col("timestamp").alias("event_time"),
        F.to_date("timestamp").alias("trade_date"),
    )


DOC_WIRE_DDL = "doc_id long, text string, lang string, source string"


def read_doc_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming source over JSON-lines document records —
    the ingest feed of the training-data pipeline (same schema-on-read
    discipline as the trade feed)."""
    reader = spark.readStream.schema(DOC_WIRE_DDL).format("json")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)
