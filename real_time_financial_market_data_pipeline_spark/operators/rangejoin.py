"""Bucketized interval (range) join.

`interval_join(left, right, max_gap)` pairs each left row with every
right row whose time falls in (left_time - max_gap, left_time] —
the general form behind "all quotes within 5 minutes before the trade"
(the reference's quote schema sets this up; SURVEY §2.5) and any
events-near-events enrichment.

Why not a plain theta join: without an equality key Catalyst can only
execute `ON r.t BETWEEN l.t - g AND l.t` as a broadcast-nested-loop /
cartesian product — quadratic, and an OOM broadcast at scale.  With an
equality key the join is hash-based but a hot key still fans out
all x all within the key before the time filter runs.

The bucket trick makes the time bound part of the JOIN KEY: bucket
time by `max_gap`; a qualifying right row lies in the same or the
previous bucket of its left row, so the left side explodes to exactly
those 2 candidate bucket keys and the join is a pure equi-join on
(key..., bucket) with the exact interval as a residual filter.
Candidates are bounded by bucket occupancy (~rate x max_gap), never by
corpus size — linear scaling, no nested loop, with or without an
equality key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    max_gap_seconds: int,
    on: Sequence[str] = (),
    left_time: str = "event_time",
    right_time: str = "event_time",
    right_suffix: str = "_right",
) -> DataFrame:
    """All (left, right) pairs with
    right_time in (left_time - max_gap_seconds, left_time], equal on
    `on`.  Returns left columns + right columns (overlaps suffixed).
    """
    if max_gap_seconds <= 0:
        raise ValueError("max_gap_seconds must be positive")
    on = list(on)

    overlap = {c for c in right.columns if c in left.columns and c not in on}
    r = right
    for c in overlap:
        r = r.withColumnRenamed(c, c + right_suffix)
    r_time = right_time + right_suffix if right_time in overlap else right_time

    l_bucket = F.floor(F.unix_micros(F.col(left_time)) / (max_gap_seconds * 1_000_000))
    r_bucket = F.floor(F.unix_micros(F.col(r_time)) / (max_gap_seconds * 1_000_000))

    # left explodes to its own and the previous bucket — the only two
    # buckets a qualifying right row can occupy
    lx = left.withColumn("_bucket", F.explode(F.array(l_bucket - 1, l_bucket)))
    rx = r.withColumn("_bucket", r_bucket)

    lower = F.col(left_time) - F.make_interval(secs=F.lit(max_gap_seconds))
    joined = lx.join(rx, on + ["_bucket"]).filter(
        (F.col(r_time) <= F.col(left_time)) & (F.col(r_time) > lower)
    )
    return joined.drop("_bucket")
