"""Deterministic sampling + dataset splitting for training-data
pipelines.

`sample()`/`randomSplit()` are seed-dependent AND partitioning-dependent
— rerunning on a repartitioned table yields a different subset, which
poisons dataset reproducibility. Hash-based selection is the
fix: membership depends only on the row's key (md5 — identical bytes on
every engine), so samples are stable across engines, partitionings, and
reruns, and disjoint splits stay disjoint under incremental appends.

All pure column expressions; the md5-prefix comparison is a string
compare, exact on any ANSI engine (no float thresholds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, n_buckets: int = 10_000) -> Column:
    """Stable bucket in [0, n_buckets): md5-prefix mod n."""
    prefix = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    return F.pmod(prefix, F.lit(n_buckets))


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, n_buckets: int = 10_000
) -> DataFrame:
    """Keep ~rate of rows, membership a pure function of the key."""
    return df.filter(hash_bucket(F.col(key_col), n_buckets) < int(rate * n_buckets))


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    n_buckets: int = 10_000,
    split_col: str = "split",
) -> DataFrame:
    """Append a stable split column: 'test' | 'val' | 'train'.

    Boundaries are bucket thresholds, so the three sets are exactly
    disjoint and stay stable as new rows arrive (a key never changes
    split)."""
    b = hash_bucket(F.col(key_col), n_buckets)
    test_hi = int(test_frac * n_buckets)
    val_hi = test_hi + int(val_frac * n_buckets)
    return df.withColumn(
        split_col,
        F.when(b < test_hi, F.lit("test"))
        .when(b < val_hi, F.lit("val"))
        .otherwise(F.lit("train")),
    )
