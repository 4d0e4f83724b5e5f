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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column, n_buckets: int = 10_000) -> Column:
    """Stable bucket in [0, n_buckets): md5-prefix mod n."""
    prefix = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    return F.pmod(prefix, F.lit(n_buckets))


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, n_buckets: int = 10_000
) -> DataFrame:
    """Keep ~rate of rows, membership a pure function of the key."""
    return df.filter(hash_bucket(F.col(key_col), n_buckets) < int(round(rate * n_buckets)))


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
    test_hi = int(round(test_frac * n_buckets))
    val_hi = test_hi + int(round(val_frac * n_buckets))
    return df.withColumn(
        split_col,
        F.when(b < test_hi, F.lit("test"))
        .when(b < val_hi, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_frac: float = 0.0,
    n_buckets: int = 10_000,
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix primitive
    ("keep 100% of code, 10% of web, drop the rest").  Unlike
    df.sampleBy (seed- and partitioning-dependent), membership is a pure
    function of the key, so the mix is reproducible across engines,
    reruns, and repartitionings, and monotone: raising a stratum's rate
    only ADDS rows (bucket thresholds nest), which keeps incremental
    dataset builds append-only."""
    b = hash_bucket(F.col(key_col), n_buckets)
    # int(round(...)) — plain int() truncates float artifacts
    # (0.29 * 10000 = 2899.9999... would silently become 2899)
    threshold = F.lit(int(round(default_frac * n_buckets)))
    for stratum, frac in fractions.items():
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(frac * n_buckets)))
        ).otherwise(threshold)
    return df.filter(b < threshold)


def token_budget_sample(
    df: DataFrame,
    key_col: str,
    token_col: str,
    budget: int,
    n_buckets: int = 1024,
) -> DataFrame:
    """Deterministic token-budget selection: documents in hash order (a
    reproducible uniform shuffle), taken until the cumulative token
    count reaches `budget` (the first document crossing the line is
    kept, so the budget is met, not undershot).  The canonical "take N
    billion tokens of this source" operation.

    Scale design — a naive global-window cumsum is a SINGLE-REDUCER
    sort, dead at 100 TB.  Instead the hash order is realized in two
    phases: (1) per-bucket token totals (one tiny hash aggregate; the
    driver prefix-sums n_buckets numbers — bounded, data-independent),
    which admit every bucket strictly below the boundary wholesale and
    reject every bucket above it; (2) an exact hash-ordered cumsum ONLY
    within the single boundary bucket (~1/n_buckets of the data, and
    that window is itself partitioned by bucket).  Result is identical
    to the global cumsum, bit-for-bit, because bucket index is the
    leading term of the hash ordering.

    NULL token counts are treated as 0 tokens everywhere (bucket totals
    and the boundary-bucket cumsum alike): a NULL-token document spends
    none of the budget but is still selected when its position in the
    hash order falls inside it."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    bucket = hash_bucket(F.col(key_col), n_buckets)
    with_b = df.withColumn("_b", bucket)
    tokens0 = F.coalesce(F.col(token_col), F.lit(0))

    totals = {
        r["_b"]: r["_t"]
        for r in with_b.groupBy("_b")
        .agg(F.coalesce(F.sum(tokens0), F.lit(0)).alias("_t"))
        .collect()
    }
    running = 0
    boundary = None
    admitted_before = 0
    for b in range(n_buckets):
        t = totals.get(b) or 0
        if running + t >= budget:
            boundary = b
            admitted_before = running
            break
        running += t
    if boundary is None:  # corpus smaller than the budget: keep everything
        return with_b.drop("_b")

    whole = with_b.filter(F.col("_b") < boundary).drop("_b")
    # exact order within the boundary bucket: hash of the key, key tiebreak
    w = (
        Window.partitionBy("_b")
        .orderBy(F.md5(F.col(key_col).cast("string")), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = admitted_before + F.coalesce(F.sum(tokens0).over(w), F.lit(0))
    partial = (
        with_b.filter(F.col("_b") == boundary)
        .withColumn("_prior_tokens", prior)
        .filter(F.col("_prior_tokens") < budget)
        .drop("_b", "_prior_tokens")
    )
    return whole.unionByName(partial)
