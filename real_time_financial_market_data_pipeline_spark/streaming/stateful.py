"""Custom stateful streaming operators (transformWithStateInPandas with
an applyInPandasWithState fallback).

streaming_latest_prices solves the reference's declared-but-unbuilt
`latest_prices` serving table (schemas/cassandra/keyspace.cql:132-141 —
table + upsert statement exist, no Spark code ever populated it): one
row per symbol carrying last price/volume/time plus change vs the
PREVIOUS trade, which needs cross-batch memory — exactly what
per-key state gives. Emits one updated row per key per micro-batch
(update mode) — the upsert stream the reference's Cassandra table
expected.

State per key is O(1) (three numbers + a timestamp), so total state is
bounded by symbol cardinality, not event volume.  With `ttl` set the
bound tightens further to ACTIVE symbol cardinality: idle keys are
evicted (timer-based in the TWS form, ProcessingTimeTimeout in the
fallback), which is what keeps a year-long run over a churning symbol
universe (delistings, expiring option chains) from accumulating dead
state.

Default path: transformWithStateInPandas (Spark 4 arbitrary-state API —
typed state variables, per-key timers).  Its python runner needs the
protobuf 6.x runtime (pyspark.sql.streaming.proto.StateMessage_pb2
enforces 6.33 via ValidateProtobufRuntimeVersion); where that import
fails — as in this test container, which has no google.protobuf at
all — the dispatcher falls back to applyInPandasWithState, which
speaks the legacy Arrow-only wire protocol and shares the exact
semantics (asserted by tests/test_stateful.py running the same
scenario through whichever path is live).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LATEST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_price", T.DoubleType()),
        T.StructField("prev_price", T.DoubleType()),
        T.StructField("last_volume", T.LongType()),
        T.StructField("last_ts_ms", T.LongType()),
    ]
)

LATEST_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("last_price", T.DoubleType()),
        T.StructField("last_volume", T.LongType()),
        T.StructField("last_trade_time", T.TimestampType()),
        T.StructField("price_change", T.DoubleType()),
        T.StructField("price_change_pct", T.DoubleType()),
    ]
)

_TWS_AVAILABLE: bool | None = None


def tws_runtime_available() -> bool:
    """True when the transformWithStateInPandas python runner can
    actually execute here.

    The TWS state server speaks protobuf: the generated
    StateMessage_pb2 module hard-requires the protobuf >= 6.33 runtime
    (ValidateProtobufRuntimeVersion at import time).  Importing it is
    therefore the exact precondition the streaming python runner checks
    before it can initialize — a failed import here is the same
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE the query would die
    with at start(), caught cheaply at plan time instead.

    SCOPE: this probes the DRIVER's Python environment only.  In local
    mode (and any homogeneous deployment image) driver == executor, so
    the probe is decisive; on a heterogeneous cluster where executors
    lack the protobuf runtime the probe can pass and the query still
    dies at start with the same error — pass prefer_tws=False to
    streaming_latest_prices there instead of relying on this check.
    """
    global _TWS_AVAILABLE
    if _TWS_AVAILABLE is None:
        try:
            import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

            _TWS_AVAILABLE = True
        except Exception:
            _TWS_AVAILABLE = False
    return _TWS_AVAILABLE


def _fold_batch(pdfs, last_price, prev_price, last_volume, last_ts):
    """Fold a micro-batch's rows (event-time ordered) into the per-key
    running (last, prev) pair. Shared by both state backends."""
    for pdf in pdfs:
        if pdf.empty:
            continue
        pdf = pdf.sort_values(["timestamp"])  # event-time order within batch
        for row in pdf.itertuples(index=False):
            ts = int(row.timestamp)
            if last_ts is None or ts >= last_ts:
                # every accepted row is a distinct trade, equal-ms
                # included (batch latest_prices parity: its event_id
                # tiebreak treats the other equal-ts row as the
                # previous trade). Exact-duplicate suppression is the
                # upstream dedup's job, not this operator's.
                if last_price is not None:
                    prev_price = last_price
                last_price = float(row.price)
                last_volume = int(row.volume)
                last_ts = ts
    return last_price, prev_price, last_volume, last_ts


def _emit_row(symbol, last_price, prev_price, last_volume, last_ts):
    change = None if prev_price is None else round(last_price - prev_price, 10)
    pct = (
        None
        if prev_price in (None, 0)
        else round(100.0 * (last_price - prev_price) / prev_price, 10)
    )
    return pd.DataFrame(
        {
            "symbol": [symbol],
            "last_price": [last_price],
            "last_volume": [last_volume],
            "last_trade_time": [pd.Timestamp(last_ts, unit="ms")],
            "price_change": [change],
            "price_change_pct": [pct],
        }
    )


def _make_update_latest(ttl_ms: int | None):
    """Closure factory (NOTES.md fact 4: default-arg binding inside the
    pyspark closure is unreliable — close over ttl_ms explicitly)."""

    def _update_latest(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        if ttl_ms is not None and state.hasTimedOut:
            # idle-key eviction: the symbol saw no trade for ttl_ms of
            # processing time — drop its state (next trade starts fresh,
            # price_change=None, exactly like a never-seen symbol)
            state.remove()
            return

        if state.exists:
            last_price, prev_price, last_volume, last_ts = state.get
        else:
            last_price = prev_price = None
            last_volume = last_ts = None

        last_price, prev_price, last_volume, last_ts = _fold_batch(
            pdfs, last_price, prev_price, last_volume, last_ts
        )

        if last_ts is not None:
            state.update((last_price, prev_price, last_volume, last_ts))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield _emit_row(symbol, last_price, prev_price, last_volume, last_ts)

    return _update_latest


class _LatestPriceProcessor:
    """transformWithStateInPandas processor — the Spark 4 arbitrary-state
    API.  Same semantics as the applyInPandasWithState form; TTL is
    timer-based: each input batch re-arms a per-key processing-time
    timer at now+ttl_ms and records the arm time in a second state
    variable, and handleExpiredTimer clears the key's state only when
    the firing timer is the latest-armed one (stale timers from earlier
    re-arms are ignored without a listTimers round-trip)."""

    ttl_ms: int | None = None  # overridden per-instance by the factory

    def init(self, handle) -> None:
        self.handle = handle
        self.state = handle.getValueState("latest", LATEST_STATE_SCHEMA)
        if self.ttl_ms is not None:
            self.expiry = handle.getValueState("expiry", "expires_at LONG")

    def handleInputRows(self, key, rows, timerValues):
        (symbol,) = key
        if self.state.exists():
            last_price, prev_price, last_volume, last_ts = self.state.get()
        else:
            last_price = prev_price = last_volume = last_ts = None

        last_price, prev_price, last_volume, last_ts = _fold_batch(
            rows, last_price, prev_price, last_volume, last_ts
        )

        if last_ts is not None:
            self.state.update((last_price, prev_price, last_volume, last_ts))
            if self.ttl_ms is not None:
                expires_at = timerValues.getCurrentProcessingTimeInMs() + self.ttl_ms
                self.expiry.update((expires_at,))
                self.handle.registerTimer(expires_at)
            yield _emit_row(symbol, last_price, prev_price, last_volume, last_ts)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if self.ttl_ms is not None and self.expiry.exists():
            (expires_at,) = self.expiry.get()
            if expiredTimerInfo.getExpiryTimeInMs() >= expires_at:
                # latest-armed timer fired with no intervening trade →
                # the key is idle; evict
                self.state.clear()
                self.expiry.clear()
        return iter(())

    def close(self) -> None:
        pass


def streaming_latest_prices_tws(trades: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """transformWithStateInPandas variant of streaming_latest_prices —
    typed state, per-key timers (idle-symbol eviction when ttl_ms set).
    Requires the protobuf 6.x runtime (see tws_runtime_available)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass dynamically so import of this module never hard-depends on
    # the new API surface
    proc_cls = type(
        "LatestPriceProcessor",
        (StatefulProcessor,),
        dict(_LatestPriceProcessor.__dict__),
    )
    proc = proc_cls()
    proc.ttl_ms = ttl_ms
    return (
        trades.select("symbol", "price", "volume", "timestamp")
        .groupBy("symbol")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=LATEST_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None" if ttl_ms is None else "ProcessingTime",
        )
    )


def streaming_latest_prices_legacy(
    trades: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """applyInPandasWithState form — the pre-Spark-4 state API.  Kept as
    the execution fallback where the TWS python runner cannot start;
    ttl_ms maps onto GroupStateTimeout.ProcessingTimeTimeout."""
    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        trades.select("symbol", "price", "volume", "timestamp")
        .groupBy("symbol")
        .applyInPandasWithState(
            _make_update_latest(ttl_ms),
            outputStructType=LATEST_OUTPUT_SCHEMA,
            stateStructType=LATEST_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def streaming_latest_prices(
    trades: DataFrame, ttl_ms: int | None = None, prefer_tws: bool = True
) -> DataFrame:
    """trades (symbol, price, volume, timestamp[ms], ...) →
    per-micro-batch updated latest-price rows with change vs previous.
    Use outputMode('update') downstream.

    Default path is transformWithStateInPandas (Spark 4); falls back to
    applyInPandasWithState when the TWS python runner's protobuf
    dependency is absent (probed once per process).  ttl_ms evicts
    idle-symbol state after that much processing time with no trades.
    """
    if prefer_tws and tws_runtime_available():
        return streaming_latest_prices_tws(trades, ttl_ms=ttl_ms)
    return streaming_latest_prices_legacy(trades, ttl_ms=ttl_ms)
