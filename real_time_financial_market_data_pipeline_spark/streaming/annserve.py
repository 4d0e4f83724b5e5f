"""Streaming ANN serving: a stream of query vectors answered top-k
against a static embedding corpus — the inference-time retrieval shape
(RAG lookup, online near-dup check before ingest, embedding joins).

Design: foreachBatch over the query stream, each micro-batch answered
by the SAME batch operators the rest of the engine uses
(`operators.similarity.brute_force_knn` / `lsh_bucketed_knn` /
`ivf_knn`) — unified code path, so streaming results can never drift
from the batch/oracle-checked forms.  The corpus is loaded once and
localCheckpoint-pinned: every micro-batch reuses the materialized
corpus (and, for the LSH/IVF strategies, Spark reuses the banded /
assigned corpus side of the equi-join plan rather than re-deriving
lineage from parquet).

Exactly-once: deterministic batch_id=N overwrite directories, same
contract as the medallion's parquet_sink.

Scale: per-batch cost is |batch queries| x (LSH bucket occupancy or
probed-cell size) for the approximate strategies — independent of
stream length, linear in corpus only through the one-time pin.  At a
true 100 TB corpus the pin becomes a bucketed table instead (the
equi-join on bucket key is unchanged); the strategy knob is the same
one the batch operators expose.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from real_time_financial_market_data_pipeline_spark.operators.similarity import (
    brute_force_knn,
    ivf_knn,
    lsh_bucketed_knn,
)

_STRATEGIES = {"exact", "lsh", "ivf"}


@dataclass
class AnnServeJob:
    """Answer a streaming query-vector feed (query_id, embedding)
    top-k against a static corpus (vec_id, embedding)."""

    out_dir: str
    k: int = 10
    strategy: str = "lsh"
    dim: int = 64  # required by the lsh strategy's plane generation
    n_planes: int = 4
    n_tables: int = 8
    n_lists: int = 16
    n_probe: int = 8
    trigger: dict = field(default_factory=lambda: {"availableNow": True})

    def checkpoints(self) -> str:
        return os.path.join(self.out_dir, "_checkpoints")

    def _answer(self, corpus: DataFrame, queries: DataFrame) -> DataFrame:
        if self.strategy == "exact":
            return brute_force_knn(corpus, queries, k=self.k)
        if self.strategy == "lsh":
            return lsh_bucketed_knn(
                corpus, queries, dim=self.dim, k=self.k,
                n_planes=self.n_planes, n_tables=self.n_tables,
            )
        if self.strategy == "ivf":
            return ivf_knn(
                corpus, queries, k=self.k,
                n_lists=self.n_lists, n_probe=self.n_probe,
            )
        raise ValueError(f"strategy must be one of {_STRATEGIES}, got {self.strategy!r}")

    def start(self, query_stream: DataFrame, corpus: DataFrame) -> StreamingQuery:
        if self.strategy not in _STRATEGIES:
            raise ValueError(f"strategy must be one of {_STRATEGIES}, got {self.strategy!r}")
        # materialize the corpus once; every micro-batch reuses the pin
        pinned = corpus.select("vec_id", "embedding").localCheckpoint(eager=True)

        def process(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            result = self._answer(pinned, batch_df.select("query_id", "embedding"))
            result.write.mode("overwrite").parquet(
                os.path.join(self.out_dir, "results", f"batch_id={batch_id}")
            )

        return (
            query_stream.writeStream.foreachBatch(process)
            .outputMode("append")
            .queryName("ann_serve")
            .option("checkpointLocation", os.path.join(self.checkpoints(), "ann_serve"))
            .trigger(**self.trigger)
            .start()
        )


RESULTS_SCHEMA = (
    "query_id bigint, neighbor_id bigint, cosine double, rank int, batch_id int"
)


def results_view(spark, out_dir: str) -> DataFrame:
    """All answered queries so far (query_id, neighbor_id, cosine, rank).

    A stream whose every micro-batch was empty never creates `results/`
    (process() early-returns before any write) — return an empty frame
    with the documented schema instead of an AnalysisException."""
    path = os.path.join(out_dir, "results")
    if not os.path.isdir(path):
        return spark.createDataFrame([], RESULTS_SCHEMA)
    return spark.read.parquet(path)
