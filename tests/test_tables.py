"""Loader type-contract tests (tables._nanos_to_ts).

The driver testdata's physical timestamp encoding has changed across
regenerations — INT64 TIMESTAMP(NANOS,false) in rounds 1-3,
timestamp[us] without timezone (Spark TIMESTAMP_NTZ) from round 4 — so
the loader must normalize every flavor it has ever seen to the same
TimestampType values.  These tests write identical rows in all three
physical flavors and assert `trades_from_events` output is
byte-identical across them (round-4 post-mortem regression).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from real_time_financial_market_data_pipeline_spark.tables import (
    load_table,
    trades_from_events,
)

# epoch-micros chosen to exercise sub-second precision and a date boundary
_TS_US = [1704067200_000000, 1704067207_179000, 1704153599_999999]
_ROWS = {
    "event_id": [0, 1, 2],
    "user_id": [8, 46, 7],
    "event_type": ["error", "click", "view"],
    "value": [6.55, 12.31, 1.63],
    "props": ['{"k": 69}', '{"k": 89}', '{"k": 29}'],
}


def _write_events(tmp_path, flavor: str) -> str:
    if flavor == "int64_nanos":
        ts = pa.array([t * 1000 for t in _TS_US], pa.int64()).cast(
            pa.timestamp("ns")
        )
    elif flavor == "us_ntz":
        ts = pa.array(_TS_US, pa.int64()).cast(pa.timestamp("us"))
    elif flavor == "us_utc":
        ts = pa.array(_TS_US, pa.int64()).cast(pa.timestamp("us", tz="UTC"))
    else:  # pragma: no cover
        raise AssertionError(flavor)
    table = pa.table({**{k: pa.array(v) for k, v in _ROWS.items()}, "ts": ts})
    d = tmp_path / flavor
    d.mkdir()
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("flavor", ["int64_nanos", "us_ntz", "us_utc"])
def test_loader_normalizes_all_physical_flavors(spark, tmp_path, flavor):
    df = load_table(spark, _write_events(tmp_path, flavor), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    trades = trades_from_events(df).orderBy("event_id")
    rows = trades.collect()
    assert [r["timestamp"] for r in rows] == [t // 1000 for t in _TS_US]
    assert [str(r["trade_date"]) for r in rows] == [
        "2024-01-01",
        "2024-01-01",
        "2024-01-01",
    ]
    assert [r["volume"] for r in rows] == [69, 89, 29]


def test_all_flavors_identical_output(spark, tmp_path):
    outs = []
    for flavor in ["int64_nanos", "us_ntz", "us_utc"]:
        df = load_table(spark, _write_events(tmp_path, flavor), "events")
        outs.append(
            [tuple(r) for r in trades_from_events(df).orderBy("event_id").collect()]
        )
    assert outs[0] == outs[1] == outs[2]


def test_sf_testdata_ts_columns_are_timestamp(spark):
    """Whatever the current driver testdata encoding is, the loader must
    surface plain TimestampType on the documented ts columns."""
    for name, col in [
        ("events", "ts"),
        ("orders", "o_orderdate"),
        ("lineitem", "l_shipdate"),
    ]:
        df = load_table(spark, "/root/testdata/sf0.001", name)
        assert dict(df.dtypes)[col] == "timestamp", (name, col)


def test_silver_cte_equivalence_random_tables(spark, tmp_path):
    """Round-5 VERDICT task 6: the hand-maintained DuckDB _TRADES_CTE
    (serving/queries.py) and the Spark _silver() pipeline are the SAME
    function — checked on randomized adversarial event tables, so the
    next dialect drift or testdata-encoding change fails here in
    seconds instead of via driver CORRECTNESS.

    Hypothesis-style seeded generator (plain random.Random for speed —
    each example costs a Spark job): tiny symbol pool to force
    (symbol, ts) dedup collisions, microsecond-only ts differences that
    collapse to one millisecond key, zero/negative prices and volumes,
    null/empty/missing JSON props, and timestamps straddling the
    AS_OF + 5 min validity boundary (inclusive edge included).
    """
    import json
    import random
    from datetime import datetime, timedelta

    import duckdb

    from real_time_financial_market_data_pipeline_spark.serving.queries import (
        _TRADES_CTE,
        _silver,
    )
    from tests.oracle_harness import compare

    base = datetime(2024, 1, 15, 10, 0, 0)
    boundary = datetime(2030, 1, 1, 0, 5, 0)  # AS_OF + 5 min, inclusive
    ts_pool = (
        [base + timedelta(seconds=s) for s in (0, 1, 2, 60, 3600, 86_400)]
        + [base + timedelta(microseconds=u) for u in (1, 500_000, 999_999)]
        + [boundary - timedelta(seconds=1), boundary, boundary + timedelta(seconds=1)]
    )
    props_pool = (
        [json.dumps({"k": v}) for v in (-5, 0, 3, 17, 2**40)]
        + ['{"k": null}', "{}", None]
    )
    price_pool = [-1.0, 0.0, 0.005, 99.99, 150.25, 1e9]

    for seed in range(4):
        rng = random.Random(seed)
        n = 120
        ids = list(range(n))
        rng.shuffle(ids)  # dedup tiebreak must pick min event_id, not row order
        table = pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(
                    [rng.choice(ts_pool) for _ in range(n)], pa.timestamp("us")
                ),
                "user_id": pa.array([rng.randrange(50) for _ in range(n)], pa.int64()),
                "event_type": pa.array([rng.choice("AB") for _ in range(n)]),
                "value": pa.array([rng.choice(price_pool) for _ in range(n)]),
                "props": pa.array([rng.choice(props_pool) for _ in range(n)]),
            }
        )
        d = tmp_path / f"gen_{seed}"
        d.mkdir()
        pq.write_table(table, str(d / "events.parquet"))

        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
        problems = compare(
            _silver(spark, str(d)),
            con,
            f"WITH {_TRADES_CTE} SELECT * FROM silver",
        )
        assert not problems, f"seed={seed}: {problems}"


def test_ohlcv_cte_equivalence_random_tables(spark, tmp_path):
    """Companion to the silver-CTE property test for the OTHER
    hand-maintained dialect fragment, _OHLCV_5M_CTE: random event tables
    through the Spark gold pipeline (_gold_5m: silver → ohlcv 5m with
    decimal-cents vwap) vs the DuckDB CTE, typed-exact.

    Pools are tighter than the silver test: prices ≤ 1e4 and volumes
    ≤ 1e6 keep the cents*volume accumulation far from BIGINT overflow
    (Spark ANSI mode throws where DuckDB silently widens to HUGEINT —
    out of the operator's documented domain)."""
    import json
    import random
    from datetime import datetime, timedelta

    import duckdb

    from real_time_financial_market_data_pipeline_spark.serving.queries import (
        _OHLCV_5M_CTE,
        _gold_5m,
    )
    from tests.oracle_harness import compare

    base = datetime(2024, 1, 15, 10, 0, 0)
    # straddle 5-minute bucket edges and pack several trades per bucket
    ts_pool = [
        base + timedelta(seconds=s)
        for s in (0, 1, 299, 300, 301, 599, 600, 900, 3600)
    ] + [base + timedelta(microseconds=u) for u in (1, 999_999)]
    props_pool = [json.dumps({"k": v}) for v in (0, 1, 250, 1_000_000)] + [None]
    price_pool = [0.005, 0.01, 7.77, 99.99, 150.25, 10_000.0, 0.0, -3.0]

    for seed in range(3):
        rng = random.Random(100 + seed)
        n = 100
        ids = list(range(n))
        rng.shuffle(ids)
        table = pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(
                    [rng.choice(ts_pool) for _ in range(n)], pa.timestamp("us")
                ),
                "user_id": pa.array([rng.randrange(9) for _ in range(n)], pa.int64()),
                "event_type": pa.array([rng.choice("ABC") for _ in range(n)]),
                "value": pa.array([rng.choice(price_pool) for _ in range(n)]),
                "props": pa.array([rng.choice(props_pool) for _ in range(n)]),
            }
        )
        d = tmp_path / f"ohlcv_gen_{seed}"
        d.mkdir()
        pq.write_table(table, str(d / "events.parquet"))

        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
        problems = compare(
            _gold_5m(spark, str(d)),
            con,
            f"WITH {_OHLCV_5M_CTE} SELECT * FROM gold_5m",
        )
        assert not problems, f"seed={seed}: {problems}"
