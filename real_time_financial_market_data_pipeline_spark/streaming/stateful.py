"""Custom stateful streaming operators (applyInPandasWithState).

streaming_latest_prices solves the reference's declared-but-unbuilt
`latest_prices` serving table (schemas/cassandra/keyspace.cql:132-141 —
table + upsert statement exist, no Spark code ever populated it): one
row per symbol carrying last price/volume/time plus change vs the
PREVIOUS trade, which needs cross-batch memory — exactly what
per-key state gives. Emits one updated row per key per micro-batch
(update mode) — the upsert stream the reference's Cassandra table
expected.

State per key is O(1) (three numbers + a timestamp), so total state is
bounded by symbol cardinality, not event volume — safe at any scale.
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


def _update_latest(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (symbol,) = key
    if state.exists:
        last_price, prev_price, last_volume, last_ts = state.get
    else:
        last_price = prev_price = None
        last_volume = last_ts = None

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

    if last_ts is not None:
        state.update((last_price, prev_price, last_volume, last_ts))
        change = None if prev_price is None else round(last_price - prev_price, 10)
        pct = (
            None
            if prev_price in (None, 0)
            else round(100.0 * (last_price - prev_price) / prev_price, 10)
        )
        yield pd.DataFrame(
            {
                "symbol": [symbol],
                "last_price": [last_price],
                "last_volume": [last_volume],
                "last_trade_time": [pd.Timestamp(last_ts, unit="ms")],
                "price_change": [change],
                "price_change_pct": [pct],
            }
        )


def streaming_latest_prices(trades: DataFrame) -> DataFrame:
    """trades (symbol, price, volume, timestamp[ms], ...) →
    per-micro-batch updated latest-price rows with change vs previous.
    Use outputMode('update') downstream."""
    return (
        trades.select("symbol", "price", "volume", "timestamp")
        .groupBy("symbol")
        .applyInPandasWithState(
            _update_latest,
            outputStructType=LATEST_OUTPUT_SCHEMA,
            stateStructType=LATEST_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class _LatestPriceProcessor:
    """transformWithStateInPandas processor — the Spark 4 arbitrary-state
    API (typed ValueState, composable state vars, future TTL support).
    Same semantics as _update_latest."""

    def init(self, handle) -> None:
        self.state = handle.getValueState("latest", LATEST_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        (symbol,) = key
        if self.state.exists():
            last_price, prev_price, last_volume, last_ts = self.state.get()
        else:
            last_price = prev_price = last_volume = last_ts = None

        for pdf in rows:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["timestamp"])
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

        if last_ts is not None:
            self.state.update((last_price, prev_price, last_volume, last_ts))
            change = None if prev_price is None else round(last_price - prev_price, 10)
            pct = (
                None
                if prev_price in (None, 0)
                else round(100.0 * (last_price - prev_price) / prev_price, 10)
            )
            yield pd.DataFrame(
                {
                    "symbol": [symbol],
                    "last_price": [last_price],
                    "last_volume": [last_volume],
                    "last_trade_time": [pd.Timestamp(last_ts, unit="ms")],
                    "price_change": [change],
                    "price_change_pct": [pct],
                }
            )

    def close(self) -> None:
        pass


def streaming_latest_prices_tws(trades: DataFrame) -> DataFrame:
    """transformWithStateInPandas variant of streaming_latest_prices —
    prefer this on Spark 4 deployments (typed state, TTL hooks, multiple
    state variables per key).

    NOTE: in this test container the TWS *driver worker* is launched
    from $SPARK_HOME's bundled python (/opt/spark), which mismatches the
    pip-installed pyspark and crashes at init
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). Plan construction
    and schema are tested; execution is covered by the
    applyInPandasWithState form above, which shares the semantics.
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass dynamically so import of this module never hard-depends on
    # the new API surface
    proc_cls = type("LatestPriceProcessor", (StatefulProcessor,), dict(_LatestPriceProcessor.__dict__))
    return (
        trades.select("symbol", "price", "volume", "timestamp")
        .groupBy("symbol")
        .transformWithStateInPandas(
            statefulProcessor=proc_cls(),
            outputStructType=LATEST_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
