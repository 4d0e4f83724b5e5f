"""As-of join: for each left event, the latest right event at-or-before it.

The natural trades⋈quotes join the reference's quote schema sets up but
never implements (reference schemas/avro/quote.avsc; SURVEY.md §2.5).

Spark-first implementation: union-merge + last(ignorenulls) over a
single (key → time) window — one shuffle on the key, one sort within
key partitions, linear in input size. This beats the naive
range-join (which Catalyst executes as broadcast-nested-loop) by
orders of magnitude and is the standard distributed as-of algorithm.
A tolerance bound makes stale matches null out.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str = "event_time",
    right_time: str = "event_time",
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left rows joined to the most recent right row with
    right_time <= left_time (direction='backward'; 'forward' mirrors).

    Right value columns come back with their own names; overlapping
    names are suffixed `_right`.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    on = list(on)

    left_cols = [c for c in left.columns if c not in on and c != left_time]
    right_cols = [c for c in right.columns if c not in on and c != right_time]
    renames = {c: (c + "_right" if c in left.columns else c) for c in right_cols}

    l_tagged = left.select(
        *on,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(renames[c]) for c in right_cols],
    )
    r_tagged = right.select(
        *on,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols],
        *[F.col(c).alias(renames[c]) for c in right_cols],
    )
    merged = l_tagged.unionByName(r_tagged)

    # Order so the right row at time T sorts before a left row at the same T
    # (backward join is inclusive: right_time <= left_time).
    if direction == "backward":
        w = Window.partitionBy(*on).orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        frame = w.rowsBetween(Window.unboundedPreceding, 0)
    else:
        w = Window.partitionBy(*on).orderBy(F.col("_t").desc(), F.col("_is_left").asc())
        frame = w.rowsBetween(Window.unboundedPreceding, 0)

    filled = merged.select(
        *on,
        "_t",
        "_is_left",
        *[F.col(c) for c in left_cols],
        *[F.last(renames[c], ignorenulls=True).over(frame).alias(renames[c]) for c in right_cols],
        F.last(F.when(F.col("_is_left") == 0, F.col("_t")), ignorenulls=True)
        .over(frame)
        .alias("_matched_t"),
    ).filter(F.col("_is_left") == 1)

    if tolerance is not None:
        if direction == "backward":
            in_tol = F.col("_matched_t") >= F.col("_t") - F.expr(f"INTERVAL {tolerance}")
        else:
            in_tol = F.col("_matched_t") <= F.col("_t") + F.expr(f"INTERVAL {tolerance}")
        filled = filled.select(
            *on,
            "_t",
            *[F.col(c) for c in left_cols],
            *[F.when(in_tol, F.col(renames[c])).otherwise(F.lit(None)).alias(renames[c]) for c in right_cols],
            F.when(in_tol, F.col("_matched_t")).otherwise(F.lit(None)).alias("asof_time"),
        )
    else:
        filled = filled.drop("_is_left").withColumnRenamed("_matched_t", "asof_time")

    return filled.withColumnRenamed("_t", left_time)
