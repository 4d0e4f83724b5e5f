"""Event-time utilities.

Capability parity: the reference's producer-side timestamp-unit
heuristic (`src/producer/validator.py:160-162, 218-221`: epoch values
<= 1e12 are seconds, normalize to ms) re-expressed as column
expressions, plus market-hours gating predicates (reference
`src/utils/time_utils.py`) as pure column logic — no UDF, usable in
batch and streaming filters alike.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPOCH_MS_THRESHOLD = 1_000_000_000_000  # > 1e12 → already milliseconds


def normalize_epoch_ms(t: Column) -> Column:
    """Heuristic unit normalization: seconds → ms when value <= 1e12."""
    return F.when(t > EPOCH_MS_THRESHOLD, t).otherwise(t * 1000).cast("long")


def epoch_ms_to_timestamp(t_ms: Column) -> Column:
    return F.timestamp_millis(t_ms.cast("long"))


def is_regular_market_hours(ts: Column) -> Column:
    """US equity regular session predicate in Eastern time (09:30–16:00,
    Mon–Fri). Holiday calendars are a lookup-table join in production;
    the predicate form keeps this partition-prunable.
    """
    et = F.convert_timezone(F.lit("UTC"), F.lit("America/New_York"), ts)
    minutes = F.hour(et) * 60 + F.minute(et)
    weekday = F.dayofweek(et)  # 1=Sun .. 7=Sat
    return (weekday >= 2) & (weekday <= 6) & (minutes >= 9 * 60 + 30) & (minutes < 16 * 60)
