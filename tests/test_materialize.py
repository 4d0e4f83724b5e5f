"""Materialized medallion layout: date partitioning on disk + proven
partition pruning on date-ranged serving reads."""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.pipeline.materialize import (
    latest_bars_from_bucketed,
    materialize_gold_bucketed,
    materialize_medallion,
)
from real_time_financial_market_data_pipeline_spark.serving.queries import QUERIES, _gold_5m, _silver
from tests.conftest import SF_DIR


def test_materialize_layout_and_pruning(spark, tmp_path):
    silver = _silver(spark, SF_DIR).withColumnRenamed("ts_ms", "timestamp")
    paths = materialize_medallion(spark, silver, str(tmp_path))
    assert set(paths) == {"silver", "gold_5m", "gold_1h"}

    # on-disk layout: one dir per trade_date
    date_dirs = [d for d in os.listdir(paths["silver"]) if d.startswith("trade_date=")]
    assert len(date_dirs) == 30  # events span 2024-01-01..30

    # a date-ranged serving query must prune to matching partitions:
    # (a) the scan carries the partition filter, (b) the files actually
    # read all live under the one matching trade_date directory
    g5 = spark.read.parquet(paths["gold_5m"])
    filtered = g5.filter(F.col("trade_date") == "2024-01-15")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*trade_date", plan), plan[:500]
    files = {
        r[0] for r in filtered.select(F.input_file_name()).distinct().collect()
    }
    assert files and all("trade_date=2024-01-15" in f for f in files), files

    # materialized gold equals recomputed gold
    recomputed = (
        _silver(spark, SF_DIR)
        .withColumnRenamed("ts_ms", "timestamp")
        .transform(lambda df: __import__("real_time_financial_market_data_pipeline_spark.operators.ohlcv", fromlist=["ohlcv"]).ohlcv(df, "5 minutes"))
        .count()
    )
    assert g5.count() == recomputed


def test_bucketed_gold_serving_is_shuffle_free(spark, tmp_path):
    """Round-2 VERDICT task 5: gold_5m written bucketBy(symbol) /
    sortBy(symbol, window_start) must serve Q5 (latest 50 bars per
    symbol) with ZERO Exchange — the bucketed scan's partitioning
    satisfies the rank window's distribution — and return exactly what
    the compute-from-silver path returns."""
    bars = _gold_5m(spark, SF_DIR)
    materialize_gold_bucketed(
        spark, bars, "gold_5m_bucketed_test", n_buckets=8,
        path=str(tmp_path / "gold_5m_bucketed"),
    )
    try:
        served = latest_bars_from_bucketed(spark, "gold_5m_bucketed_test")
        plan = served._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan[:2000]

        expected = sorted(
            tuple(r) for r in QUERIES["latest_bars_per_symbol"](spark, SF_DIR).collect()
        )
        got = sorted(tuple(r) for r in served.collect())
        assert got == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS gold_5m_bucketed_test")


def test_bucketed_gold_serves_q6_q7_day_over_day_shuffle_free(spark, tmp_path):
    """Round-3 VERDICT task 7: Q6/Q7 (volume/trade_count by symbol) and
    day-over-day volume also serve off the bucketed gold layout with
    ZERO Exchange — grouping/window keys are supersets of the bucket key
    (symbol), so the scan's HashPartitioning satisfies every
    distribution in both plans — and match the recompute path."""
    from real_time_financial_market_data_pipeline_spark.pipeline.materialize import (
        day_over_day_from_bucketed,
        volume_by_symbol_from_bucketed,
    )
    from real_time_financial_market_data_pipeline_spark.serving.queries import REF_DATE

    bars = _gold_5m(spark, SF_DIR)
    materialize_gold_bucketed(
        spark, bars, "gold_5m_bucketed_t2", n_buckets=8,
        path=str(tmp_path / "gold_5m_bucketed"),
    )
    try:
        vol = volume_by_symbol_from_bucketed(spark, "gold_5m_bucketed_t2", REF_DATE)
        plan = vol._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        expected = sorted(
            tuple(r) for r in QUERIES["volume_by_symbol_on_date"](spark, SF_DIR).collect()
        )
        assert sorted(tuple(r) for r in vol.collect()) == expected

        dod = day_over_day_from_bucketed(spark, "gold_5m_bucketed_t2")
        plan = dod._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        # day_over_day_volume recomputes from silver (daily sums are the
        # same through 5m bars: windows never span dates)
        expected = sorted(
            tuple(r) for r in QUERIES["day_over_day_volume"](spark, SF_DIR).collect()
        )
        assert sorted(tuple(r) for r in dod.collect()) == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS gold_5m_bucketed_t2")


def test_compact_gold_bucketed_folds_and_registers(spark, tmp_path):
    """compact_gold_bucketed: fold hand-laid update-mode batch dirs into a
    bucketed snapshot, register the serving table, and serve Q5
    zero-Exchange — plus idempotent re-run and the re-layout branch for a
    snapshot previously folded PLAIN (or with a different bucket spec)."""
    import pandas as pd

    from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
        compact_gold_bucketed,
        compact_latest_state,
        latest_state_on_read,
    )

    path = str(tmp_path / "gold_stream")
    os.makedirs(path)
    base = pd.Timestamp("2024-01-01 10:00:00")

    def bars(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                rows,
                columns=[
                    "symbol", "window_start", "window_end",
                    "open", "high", "low", "close", "volume",
                ],
            )
        )

    # batch 0 seeds two symbols; batch 2 re-emits AAPL's bar (update mode)
    bars(
        [
            ("AAPL", base, base + pd.Timedelta("5min"), 99.0, 102.0, 98.0, 100.0, 10),
            ("MSFT", base, base + pd.Timedelta("5min"), 49.0, 51.0, 48.0, 50.0, 5),
        ]
    ).write.parquet(os.path.join(path, "batch_id=0"))
    bars(
        [("AAPL", base, base + pd.Timedelta("5min"), 99.0, 103.0, 98.0, 101.0, 25)]
    ).write.parquet(os.path.join(path, "batch_id=2"))

    keys = ["symbol", "window_start", "window_end"]
    folded = compact_gold_bucketed(spark, path, keys, "gold_stream_serving", n_buckets=4)
    try:
        assert folded == 2
        assert [d for d in os.listdir(path) if d.startswith("batch_id=")] == ["batch_id=2"]
        served = latest_bars_from_bucketed(spark, "gold_stream_serving", k=5)
        plan = served._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        got = {(r["symbol"]): r for r in spark.table("gold_stream_serving").collect()}
        assert got["AAPL"]["close"] == 101.0 and got["AAPL"]["volume"] == 25
        assert got["MSFT"]["close"] == 50.0

        # idempotent re-run: nothing to fold, table re-registered, same rows
        assert compact_gold_bucketed(spark, path, keys, "gold_stream_serving", n_buckets=4) == 0
        assert spark.table("gold_stream_serving").count() == 2

        # different bucket spec: marker mismatch forces a re-layout, never
        # a silent mis-declared bucketing
        compact_gold_bucketed(spark, path, keys, "gold_stream_serving", n_buckets=2)
        plan = (
            latest_bars_from_bucketed(spark, "gold_stream_serving", k=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, plan[:2000]
        assert spark.table("gold_stream_serving").count() == 2

        # plain-folded sink (compact_latest_state) then bucketed publish:
        # the re-layout branch rewrites the snapshot bucketed
        path2 = str(tmp_path / "gold_stream2")
        os.makedirs(path2)
        bars(
            [("AAPL", base, base + pd.Timedelta("5min"), 99.0, 102.0, 98.0, 100.0, 10)]
        ).write.parquet(os.path.join(path2, "batch_id=0"))
        bars(
            [("AAPL", base, base + pd.Timedelta("5min"), 99.0, 104.0, 98.0, 102.0, 30)]
        ).write.parquet(os.path.join(path2, "batch_id=1"))
        compact_latest_state(spark, path2, keys)  # plain fold
        compact_gold_bucketed(spark, path2, keys, "gold_stream2_serving", n_buckets=4)
        rows = spark.table("gold_stream2_serving").collect()
        assert len(rows) == 1 and rows[0]["close"] == 102.0

        # stranded _compact_trash (crash between the refold branch's
        # rename(snap, trash) and rmtree(trash)) is removed at entry —
        # without the entry cleanup it would persist indefinitely and
        # double the layer's disk footprint (round-8 ADVICE)
        trash = os.path.join(path2, "_compact_trash")
        os.makedirs(trash)
        with open(os.path.join(trash, "stale.parquet"), "w") as f:
            f.write("junk")
        compact_gold_bucketed(spark, path2, keys, "gold_stream2_serving", n_buckets=4)
        assert not os.path.exists(trash)
        assert spark.table("gold_stream2_serving").count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS gold_stream_serving")
        spark.sql("DROP TABLE IF EXISTS gold_stream2_serving")


def test_streamed_then_compacted_gold_serving_is_shuffle_free(spark, tmp_path):
    """Round-5 VERDICT task 4 end-to-end: trades streamed through the
    medallion job, gold published via publish_gold_bucketed, and Q5
    served off the result with ZERO Exchange — streamed gold gets the
    same zero-Exchange serving path as batch-materialized gold."""
    import json

    from real_time_financial_market_data_pipeline_spark.sources.streaming import read_trade_stream
    from real_time_financial_market_data_pipeline_spark.streaming.jobs import MedallionStreamJob

    T0 = 1_700_000_100_000
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    with open(os.path.join(feed, "b0.json"), "w") as f:
        for i, (s, p, v) in enumerate(
            [("AAPL", 150.25, 100), ("AAPL", 150.30, 50), ("MSFT", 380.0, 200)]
        ):
            f.write(json.dumps({"s": s, "p": p, "v": v, "t": T0 + i * 100}) + "\n")

    job = MedallionStreamJob(out_dir=str(tmp_path / "out"))
    mgr = job.start(read_trade_stream(spark, feed))
    assert mgr.await_all(timeout_s=120)

    table = job.publish_gold_bucketed(spark, "gold_5m", n_buckets=4)
    try:
        served = latest_bars_from_bucketed(spark, table, k=5)
        plan = served._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        got = {r["symbol"]: r for r in served.collect()}
        assert got["AAPL"]["close"] == 150.30 and got["AAPL"]["volume"] == 150
        assert got["MSFT"]["volume"] == 200
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_compact_gold_bucketed_recovers_from_relayout_crash_windows(spark, tmp_path):
    """The re-layout branch (plain snapshot → bucketed rewrite) shares
    compact_latest_state's staged-rename protocol; both crash windows
    must recover on re-run with no data loss:
      (a) crash after staging, before the old plain snapshot is removed
          → both dirs on disk; re-run finishes the publish;
      (b) crash after removal, before the staged rename → only the
          staged dir on disk; re-run publishes it."""
    import shutil

    import pandas as pd

    from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
        compact_gold_bucketed,
        compact_latest_state,
    )

    base = pd.Timestamp("2024-01-01 10:00:00")
    keys = ["symbol", "window_start", "window_end"]

    def seed(path):
        os.makedirs(path)
        df = spark.createDataFrame(
            pd.DataFrame(
                [
                    ("AAPL", base, base + pd.Timedelta("5min"), 99.0, 102.0, 98.0, 100.0, 10),
                    ("MSFT", base, base + pd.Timedelta("5min"), 49.0, 51.0, 48.0, 50.0, 5),
                ],
                columns=[
                    "symbol", "window_start", "window_end",
                    "open", "high", "low", "close", "volume",
                ],
            )
        )
        df.write.parquet(os.path.join(path, "batch_id=0"))
        df.withColumn("close", df.close + 1).write.parquet(os.path.join(path, "batch_id=3"))
        compact_latest_state(spark, path, keys)  # plain fold → batch_id=3

    def stage_bucketed(path, n_buckets):
        """Reproduce the re-layout's staging steps up to the crash point."""
        snap = os.path.join(path, "batch_id=3")
        inprog = os.path.join(path, "_compact_inprogress")
        tmp_table = "crashwin__staging"
        spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
        (
            spark.read.parquet(snap)
            .repartition(n_buckets, "symbol")
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, "symbol")
            .sortBy("symbol", "window_start")
            .option("path", inprog)
            .saveAsTable(tmp_table)
        )
        spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
        import json as _json

        with open(os.path.join(inprog, "_bucket_spec.json"), "w") as fh:
            _json.dump({"n_buckets": n_buckets, "bucket_col": "symbol"}, fh)
        os.rename(inprog, os.path.join(path, "_compact_staged_3"))
        return snap

    # window (a): staged + plain snapshot both present
    path_a = str(tmp_path / "gold_a")
    seed(path_a)
    stage_bucketed(path_a, n_buckets=4)
    compact_gold_bucketed(spark, path_a, keys, "crashwin_a_serving", n_buckets=4)
    try:
        rows = {r["symbol"]: r for r in spark.table("crashwin_a_serving").collect()}
        assert rows["AAPL"]["close"] == 101.0 and rows["MSFT"]["close"] == 51.0
        assert [d for d in os.listdir(path_a) if d.startswith("_compact")] == []
    finally:
        spark.sql("DROP TABLE IF EXISTS crashwin_a_serving")

    # window (b): plain snapshot already removed, only the staged dir left
    path_b = str(tmp_path / "gold_b")
    seed(path_b)
    snap_b = stage_bucketed(path_b, n_buckets=4)
    shutil.rmtree(snap_b)
    compact_gold_bucketed(spark, path_b, keys, "crashwin_b_serving", n_buckets=4)
    try:
        rows = {r["symbol"]: r for r in spark.table("crashwin_b_serving").collect()}
        assert rows["AAPL"]["close"] == 101.0 and rows["MSFT"]["close"] == 51.0
        assert [d for d in os.listdir(path_b) if d.startswith("_compact")] == []
    finally:
        spark.sql("DROP TABLE IF EXISTS crashwin_b_serving")


def test_publish_refresh_loop_folds_new_deltas(spark, tmp_path):
    """The operational loop: publish bucketed → stream appends more
    update-mode deltas above the snapshot → republish.  The refold must
    combine the bucketed snapshot with the plain new deltas (per-key
    latest by batch_id), collapse to ONE snapshot at the new max id, and
    the serving table must reflect the refreshed values."""
    import pandas as pd

    from real_time_financial_market_data_pipeline_spark.streaming.sinks import compact_gold_bucketed

    path = str(tmp_path / "gold_stream")
    os.makedirs(path)
    base = pd.Timestamp("2024-01-01 10:00:00")
    cols = ["symbol", "window_start", "window_end", "open", "high", "low", "close", "volume"]

    def bars(rows):
        return spark.createDataFrame(pd.DataFrame(rows, columns=cols))

    keys = ["symbol", "window_start", "window_end"]
    bars(
        [
            ("AAPL", base, base + pd.Timedelta("5min"), 99.0, 102.0, 98.0, 100.0, 10),
            ("MSFT", base, base + pd.Timedelta("5min"), 49.0, 51.0, 48.0, 50.0, 5),
        ]
    ).write.parquet(os.path.join(path, "batch_id=0"))
    compact_gold_bucketed(spark, path, keys, "refresh_loop_serving", n_buckets=4)
    try:
        assert {
            r["symbol"]: r["close"] for r in spark.table("refresh_loop_serving").collect()
        } == {"AAPL": 100.0, "MSFT": 50.0}

        # stream restarts and appends two more update batches (plain dirs)
        bars(
            [("AAPL", base, base + pd.Timedelta("5min"), 99.0, 103.0, 98.0, 101.0, 20)]
        ).write.parquet(os.path.join(path, "batch_id=1"))
        bars(
            [
                ("AAPL", base, base + pd.Timedelta("5min"), 99.0, 104.0, 98.0, 102.0, 30),
                ("GOOG", base, base + pd.Timedelta("5min"), 140.0, 141.0, 139.0, 140.5, 7),
            ]
        ).write.parquet(os.path.join(path, "batch_id=4"))

        def created_time():
            return {
                r["col_name"]: r["data_type"]
                for r in spark.sql("DESCRIBE TABLE EXTENDED refresh_loop_serving").collect()
            }.get("Created Time")

        t_created = created_time()
        folded = compact_gold_bucketed(spark, path, keys, "refresh_loop_serving", n_buckets=4)
        assert folded == 3  # old snapshot + both deltas
        assert [d for d in os.listdir(path) if d.startswith("batch_id=")] == ["batch_id=4"]
        got = {r["symbol"]: r for r in spark.table("refresh_loop_serving").collect()}
        assert got["AAPL"]["close"] == 102.0 and got["AAPL"]["volume"] == 30
        assert got["MSFT"]["close"] == 50.0  # untouched key survives the refold
        assert got["GOOG"]["close"] == 140.5  # new key arrives
        # same spec → republish took the ALTER SET LOCATION fast-path
        # (metadata-only; table never dropped), visible as a stable
        # Created Time across the refresh
        assert created_time() == t_created
        served = latest_bars_from_bucketed(spark, "refresh_loop_serving", k=5)
        plan = served._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
    finally:
        spark.sql("DROP TABLE IF EXISTS refresh_loop_serving")


def test_cobucketed_join_is_shuffle_free(spark, tmp_path):
    """Co-located JOIN leg of the bucketing story: two tables bucketed
    on symbol with the same bucket count join with ZERO Exchange (the
    100 TB fact⋈fact case where neither side broadcasts — broadcast is
    disabled here to force the merge join and prove the scan
    partitioning alone satisfies both sides)."""
    bars = _gold_5m(spark, SF_DIR)
    materialize_gold_bucketed(
        spark, bars, "cobucket_gold", n_buckets=4, path=str(tmp_path / "g")
    )
    stats = bars.groupBy("symbol").agg(
        F.avg("vwap").alias("avg_vwap"), F.sum("volume").alias("sym_volume")
    )
    (
        stats.repartition(4, "symbol")
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(4, "symbol")
        .sortBy("symbol")
        .option("path", str(tmp_path / "s"))
        .saveAsTable("cobucket_stats")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("cobucket_gold")
            .join(spark.table("cobucket_stats"), "symbol")
            .select("symbol", "window_start", "close", "avg_vwap", "sym_volume")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan, plan[:2000]
        # values match the recompute join
        expected = bars.join(stats, "symbol").count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS cobucket_gold")
        spark.sql("DROP TABLE IF EXISTS cobucket_stats")
