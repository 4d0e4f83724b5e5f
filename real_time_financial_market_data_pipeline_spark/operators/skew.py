"""Skew-mitigation helpers.

AQE handles skewed JOINS automatically; skewed high-cardinality
AGGREGATES with a few giant keys still serialize a whole key into one
task at the final stage. `salted_agg` is the classic two-phase fix:
pre-aggregate on (key, salt) — splitting a hot key across `n_salts`
tasks — then merge the partials on the key alone. Works for any
algebraic aggregate (re-aggregatable partials).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[Column, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    aggs: output_name -> (input_column, merge_fn_name) where
    merge_fn_name in {"sum", "min", "max", "count"} — "count" partials
    merge by sum. Example:

        salted_agg(df, ["symbol"], {
            "volume": (F.col("volume"), "sum"),
            "high":   (F.col("price"), "max"),
            "n":      (F.lit(1), "count"),
        })
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    partial_fns = {"sum": F.sum, "min": F.min, "max": F.max, "count": F.count}
    merge_fns = {"sum": F.sum, "min": F.min, "max": F.max, "count": F.sum}

    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(
            *[
                partial_fns[how](col).alias(f"_p_{name}")
                for name, (col, how) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*group_cols).agg(
        *[
            merge_fns[how](F.col(f"_p_{name}")).alias(name)
            for name, (col, how) in aggs.items()
        ]
    )
