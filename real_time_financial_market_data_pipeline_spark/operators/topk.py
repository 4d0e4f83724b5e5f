"""Per-group top-k (serving-layer pattern: latest-N bars per symbol).

Capability parity: the reference serves top-N-latest via Cassandra
clustering order + LIMIT (`schemas/cassandra/keyspace.cql:36`,
`ORDER BY window_start DESC LIMIT 50` dashboard queries). Spark-first:
rank-within-partition, which Catalyst executes as a partial sort with
a WindowGroupLimit pushdown (no global sort, no full materialization).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)
