"""Property-based tests (hypothesis): operator invariants that must hold
for ANY input, not just fixtures."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.operators.asof import asof_join
from real_time_financial_market_data_pipeline_spark.operators.ohlcv import ohlcv

BASE = datetime(2024, 1, 1)

trades_strategy = st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]),
        st.floats(min_value=0.01, max_value=1e5, allow_nan=False, width=64),
        st.integers(min_value=1, max_value=10_000),
        st.integers(min_value=0, max_value=3600),  # seconds offset
    ),
    min_size=1,
    max_size=40,
)

_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(rows=trades_strategy)
@_settings
def test_ohlcv_invariants(spark, rows):
    df = spark.createDataFrame(
        [(s, p, v, BASE + timedelta(seconds=off)) for s, p, v, off in rows],
        "symbol string, price double, volume long, event_time timestamp",
    )
    bars = ohlcv(df, "5 minutes").collect()
    # conservation: every input row lands in exactly one bar
    assert sum(b["trade_count"] for b in bars) == len(rows)
    assert sum(b["volume"] for b in bars) == sum(v for _, _, v, _ in rows)
    for b in bars:
        assert b["low"] <= b["open"] <= b["high"]
        assert b["low"] <= b["close"] <= b["high"]
        assert b["low"] <= b["vwap"] <= b["high"] or abs(b["vwap"] - b["low"]) < 1e-9
        assert b["window_end"] == b["window_start"] + timedelta(minutes=5)


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["A", "B", "C"]), st.integers(0, 5), st.integers(0, 1000)),
        min_size=1,
        max_size=30,
    )
)
@_settings
def test_exact_dedup_idempotent_and_complete(spark, rows):
    from real_time_financial_market_data_pipeline_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(s, t, v) for s, t, v in rows], "symbol string, timestamp long, event_id long"
    )
    once = exact_dedup(df, ["symbol", "timestamp"], tiebreaker_col="event_id")
    twice = exact_dedup(once, ["symbol", "timestamp"], tiebreaker_col="event_id")
    got = sorted(map(tuple, once.collect()))
    assert got == sorted(map(tuple, twice.collect()))  # idempotent
    keys = {(s, t) for s, t, _ in rows}
    assert {(r[0], r[1]) for r in got} == keys  # every key survives once
    # survivor is always the minimum tiebreaker for its key
    expect = {}
    for s, t, v in rows:
        expect[(s, t)] = min(v, expect.get((s, t), v))
    assert {(r[0], r[1]): r[2] for r in got} == expect


@given(
    left_offs=st.lists(st.integers(min_value=0, max_value=600), min_size=1, max_size=15),
    right_offs=st.lists(st.integers(min_value=0, max_value=600), min_size=0, max_size=15),
)
@_settings
def test_asof_join_invariants(spark, left_offs, right_offs):
    left = spark.createDataFrame(
        [(1, BASE + timedelta(seconds=o), float(i)) for i, o in enumerate(left_offs)],
        "k int, event_time timestamp, lv double",
    )
    right = spark.createDataFrame(
        [(1, BASE + timedelta(seconds=o), float(o)) for o in right_offs],
        "k int, event_time timestamp, rv double",
    ) if right_offs else spark.createDataFrame([], "k int, event_time timestamp, rv double")

    out = asof_join(left, right, on=["k"]).collect()
    assert len(out) == len(left_offs)  # left-join semantics: no row loss
    for r in out:
        if r["asof_time"] is not None:
            assert r["asof_time"] <= r["event_time"]  # never a future match
            # the match is the LATEST right row at-or-before: rv == seconds
            # offset of that row, so no right row may exist strictly between
            matched_off = int(r["rv"])
            row_off = int((r["event_time"] - BASE).total_seconds())
            between = [o for o in right_offs if matched_off < o <= row_off]
            assert not between
        else:
            row_off = int((r["event_time"] - BASE).total_seconds())
            assert not [o for o in right_offs if o <= row_off]
