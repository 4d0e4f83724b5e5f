"""Row validation + dead-letter split + validation metrics.

Capability parity: the reference's producer-side Python validator
(`src/producer/validator.py:72-206` — required fields, price/volume
range, future-timestamp rejection) re-expressed as pure column
predicates so validation runs distributed inside the scan stage instead
of row-at-a-time in a single Python process. The dead-letter split is
two filters off one cached plan (Catalyst reuses the scan), matching
the reference's valid/dead-letter fan-out (`src/producer/pipeline.py:
120-126`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PRICE_MAX = 1_000_000.0
FUTURE_TOLERANCE = "5 MINUTES"  # reference validator.py:84 rejects ts > now+5min


def _error_conditions(
    price: Column, volume: Column, event_time: Column, now: Column
) -> list[tuple[str, Column]]:
    return [
        ("missing_field", price.isNull() | volume.isNull() | event_time.isNull()),
        ("negative_price", price.isNotNull() & (price <= 0)),
        ("price_too_high", price.isNotNull() & (price > PRICE_MAX)),
        ("negative_volume", volume.isNotNull() & (volume < 0)),
        ("volume_zero", volume.isNotNull() & (volume == 0)),
        (
            "future_timestamp",
            event_time.isNotNull()
            & (event_time > now + F.expr(f"INTERVAL {FUTURE_TOLERANCE}")),
        ),
    ]


def with_validation_errors(
    df: DataFrame,
    price_col: str = "price",
    volume_col: str = "volume",
    time_col: str = "event_time",
    now: Column | None = None,
) -> DataFrame:
    """Append an `errors` array<string> column (empty = valid row).

    `now` defaults to current_timestamp(); pass a literal for
    reproducible runs/tests.
    """
    now = F.current_timestamp() if now is None else now
    conds = _error_conditions(F.col(price_col), F.col(volume_col), F.col(time_col), now)
    errors = F.array_compact(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in conds])
    )
    return df.withColumn("errors", errors)


def split_valid(df_with_errors: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid_rows_without_errors_col, dead_letter_rows)."""
    valid = df_with_errors.filter(F.size("errors") == 0).drop("errors")
    dead = df_with_errors.filter(F.size("errors") > 0)
    return valid, dead


def dead_letter_records(dead: DataFrame) -> DataFrame:
    """Dead-letter envelope: original row as JSON + error list + timestamp
    (reference pipeline.py:120-126 shape)."""
    payload_cols = [c for c in dead.columns if c != "errors"]
    return dead.select(
        F.to_json(F.struct(*payload_cols)).alias("original"),
        F.col("errors"),
        F.current_timestamp().alias("dead_lettered_at"),
    )


def validation_metrics(df_with_errors: DataFrame) -> DataFrame:
    """Counter set matching the reference's ValidationMetrics
    (validator.py:22-69): total / valid / invalid + per-reason counts.
    Single hash aggregate; also usable via df.observe() in streaming.
    """
    reasons = [
        "missing_field",
        "negative_price",
        "price_too_high",
        "negative_volume",
        "volume_zero",
        "future_timestamp",
    ]
    aggs = [
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.size("errors") == 0, 1).otherwise(0)).alias("valid"),
        F.sum(F.when(F.size("errors") > 0, 1).otherwise(0)).alias("invalid"),
    ] + [
        F.sum(F.when(F.array_contains("errors", r), 1).otherwise(0)).alias(r)
        for r in reasons
    ]
    return df_with_errors.agg(*aggs)
