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


def bounded_ordered_path(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    cap: int,
    path_col: str = "path",
    count_col: str = "n_rows",
) -> DataFrame:
    """Per-group ordered value array, BOUNDED to the first `cap` rows in
    `order_cols` order, plus the full (uncapped) group row count.

    The cap is enforced before the collect: a row_number filter keeps
    rank <= cap rows, so collect_list state is <= cap elements however
    hot the group — the scale-safe form of an ordered collect_list
    (which is otherwise unbounded per-group executor memory).  The rank
    window and the aggregate hash-partition on the same keys, so the
    rank pass adds no extra exchange.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    w_rank = Window.partitionBy(*group_cols).orderBy(*order_cols)
    w_all = Window.partitionBy(*group_cols)
    ranked = df.select(
        *group_cols,
        *order_cols,
        value_col,
        F.row_number().over(w_rank).alias("_rn"),
        F.count(F.lit(1)).over(w_all).alias("_n"),
    ).filter(F.col("_rn") <= cap)
    packed = F.sort_array(
        F.collect_list(F.struct(*[F.col(c) for c in order_cols], F.col(value_col)))
    )
    return ranked.groupBy(*group_cols).agg(
        F.transform(packed, lambda x: x[value_col]).alias(path_col),
        F.max("_n").alias(count_col),
    )
