"""Streaming sinks + multi-query fan-out manager.

Capability parity: reference S4 (Cassandra foreachBatch sink,
src/consumer/sinks.py:88-132 — here a partitioned-parquet foreachBatch
writer with per-layer checkpoints), S5 (console sink), S6 (Kafka egress
via to_json(struct(*))), S7 (SinkManager fan-out,
src/consumer/sinks.py:209-245).

Exactly-once story: checkpointed source offsets + idempotent batch
writes (each micro-batch overwrites its own batch_id=<n> directory, so
replays after a crash-before-checkpoint rewrite instead of duplicating).
Update-mode aggregate layers additionally dedup-on-read by max batch_id
per key (latest_state_on_read) — the parquet analogue of Cassandra's
primary-key upsert the reference relied on
(docs/research/CASSANDRA_MODELING.md:69-75).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def parquet_sink(
    df: DataFrame,
    path: str,
    checkpoint_dir: str,
    name: str,
    output_mode: str = "append",
    trigger: dict | None = None,
    partition_by: list[str] | None = None,
) -> StreamingQuery:
    """foreachBatch parquet writer: empty-batch early-exit, date partitioning.

    Idempotent under replay: each micro-batch lands in its own
    `batch_id=<n>` directory with OVERWRITE mode, so a batch re-run
    after a crash-before-checkpoint rewrites the same directory instead
    of appending duplicates (deterministic-batch-id idempotence — the
    lake equivalent of the reference's primary-key upserts). Readers of
    `path` see `batch_id` as a discovered partition column.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        writer = batch_df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(os.path.join(path, f"batch_id={batch_id}"))

    stream = (
        df.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .queryName(name)
        .option("checkpointLocation", os.path.join(checkpoint_dir, name))
    )
    stream = stream.trigger(**(trigger or {"availableNow": True}))
    return stream.start()


def latest_state_on_read(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Upsert-on-read companion for update-mode sinks that appended every
    micro-batch emission: keep only the row with the max batch_id per key."""
    packed_cols = [c for c in df.columns if c not in key_cols]
    packed = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*packed_cols), F.col("batch_id")).alias("_row")
    )
    return packed.select(
        *key_cols, *[F.col(f"_row.{c}").alias(c) for c in packed_cols if c != "batch_id"]
    )


def console_sink(df: DataFrame, name: str, num_rows: int = 20, truncate: bool = True) -> StreamingQuery:
    return (
        df.writeStream.format("console")
        .queryName(name)
        .option("numRows", num_rows)
        .option("truncate", truncate)
        .outputMode("append")
        .start()
    )


def kafka_egress_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    name: str,
    key_col: str = "symbol",
) -> StreamingQuery:
    """Re-publish rows to Kafka as JSON keyed by symbol (reference S6
    selectExpr shape). Needs the Kafka connector on the classpath."""
    return (
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.to_json(F.struct(*[c for c in df.columns])).alias("value"),
        )
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", os.path.join(checkpoint_dir, name))
        .queryName(name)
        .start()
    )


class SinkManager:
    """Tracks N concurrent StreamingQuery handles off one job: add, await,
    stop, status — one place to manage the medallion fan-out."""

    def __init__(self) -> None:
        self._queries: dict[str, StreamingQuery] = {}

    def add(self, query: StreamingQuery) -> StreamingQuery:
        self._queries[query.name or str(query.id)] = query
        return query

    def add_from(self, factory: Callable[[], StreamingQuery]) -> StreamingQuery:
        return self.add(factory())

    @property
    def queries(self) -> dict[str, StreamingQuery]:
        return dict(self._queries)

    def await_all(self, timeout_s: float | None = None) -> bool:
        """Wait until every query stops (availableNow completes) or the
        overall deadline elapses. Returns True if all stopped.

        `timeout_s` is one wall-clock budget for the whole fan-out, not
        per query: a shrinking remainder is passed to each successive
        awaitTermination, so N queries can never block N * timeout_s.
        """
        if timeout_s is None:
            for q in self._queries.values():
                q.awaitTermination()
            return True
        import time

        deadline = time.monotonic() + timeout_s
        all_done = True
        for q in self._queries.values():
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                all_done = all_done and not q.isActive
            else:
                all_done = q.awaitTermination(remaining) and all_done
        return all_done

    def status(self) -> dict[str, dict]:
        return {
            name: {
                "id": str(q.id),
                "isActive": q.isActive,
                "status": q.status,
                "lastProgress": q.lastProgress,
            }
            for name, q in self._queries.items()
        }

    def stop_all(self) -> None:
        for q in self._queries.values():
            if q.isActive:
                q.stop()
