"""SparkSession factory + runtime configuration.

Scale posture: AQE on (runtime re-plan, partition coalescing, skew-join
handling), shuffle partitions sized to the local core count (on a real
cluster you'd size to ~2-3x total cores or rely on AQE coalescing),
Arrow enabled for the Pandas-UDF slow path, session timezone pinned to
UTC so event-time arithmetic is reproducible anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs that every query entry point applies defensively —
# the correctness driver hands us ITS SparkSession, so anything our readers
# depend on must be settable mid-session (all of these are).
RUNTIME_CONF: dict[str, str] = {
    # driver testdata parquet has shipped timestamps as INT64 TIMESTAMP(NANOS)
    # (no native Spark type; read as long + convert in tables._nanos_to_ts)
    # and as timestamp[us] NTZ; the loader normalizes both to TimestampType
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (driver-owned or ours)."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable in this deployment; defaults are acceptable
    return spark


def with_forced_skew_split(spark: SparkSession, enabled: bool = True) -> SparkSession:
    """Apply the measured skew posture for join→aggregate pipelines whose
    build side cannot broadcast (SCALE.md 'Skewed joins'): AQE's skew
    split must be FORCED there, because the unforced rule declines to
    split any join whose output partitioning a downstream aggregate
    could reuse — measured 3x slower than no AQE at all on a 90%-hot
    key, vs 2.7x FASTER than naive when forced.  Broadcast remains the
    first choice when the dimension fits (the engine default); call this
    before running large non-broadcastable skewed joins, and pass
    enabled=False to restore the default.
    """
    spark.conf.set(
        "spark.sql.adaptive.forceOptimizeSkewedJoin", "true" if enabled else "false"
    )
    return spark


def get_spark(
    app_name: str = "real_time_financial_market_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)
