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


# US market holiday calendar (reference src/utils/time_utils.py:32-60:
# the 2024-2025 NYSE full-closure list).  A 20-literal IN-list is the
# cheapest possible "broadcast lookup" — pure column predicate, no join,
# no UDF; a production build would swap in a maintained holiday dim
# table via a broadcast join with identical semantics.
MARKET_HOLIDAYS_2024_2025: tuple[str, ...] = (
    "2024-01-01",  # New Year's Day
    "2024-01-15",  # MLK Day
    "2024-02-19",  # Presidents Day
    "2024-03-29",  # Good Friday
    "2024-05-27",  # Memorial Day
    "2024-06-19",  # Juneteenth
    "2024-07-04",  # Independence Day
    "2024-09-02",  # Labor Day
    "2024-11-28",  # Thanksgiving
    "2024-12-25",  # Christmas
    "2025-01-01",  # New Year's Day
    "2025-01-20",  # MLK Day
    "2025-02-17",  # Presidents Day
    "2025-04-18",  # Good Friday
    "2025-05-26",  # Memorial Day
    "2025-06-19",  # Juneteenth
    "2025-07-04",  # Independence Day
    "2025-09-01",  # Labor Day
    "2025-11-27",  # Thanksgiving
    "2025-12-25",  # Christmas
)

# session boundaries, minutes after midnight ET (reference
# src/utils/time_utils.py:23-29; half-open intervals — see market_session)
PRE_MARKET_OPEN_MIN = 4 * 60
MARKET_OPEN_MIN = 9 * 60 + 30
MARKET_CLOSE_MIN = 16 * 60
AFTER_HOURS_CLOSE_MIN = 20 * 60


def _eastern(ts: Column) -> Column:
    return F.convert_timezone(F.lit("UTC"), F.lit("America/New_York"), ts)


def is_market_holiday(ts: Column) -> Column:
    """True when the Eastern-time calendar date is a full-closure US
    market holiday (2024-2025 calendar)."""
    return F.to_date(_eastern(ts)).isin(*MARKET_HOLIDAYS_2024_2025)


def is_trading_day(ts: Column) -> Column:
    """Mon-Fri and not a holiday, evaluated on the Eastern-time date."""
    et = _eastern(ts)
    weekday = F.dayofweek(et)  # 1=Sun .. 7=Sat
    return (weekday >= 2) & (weekday <= 6) & ~F.to_date(et).isin(*MARKET_HOLIDAYS_2024_2025)


def _session_minutes(ts: Column) -> Column:
    et = _eastern(ts)
    return F.hour(et) * 60 + F.minute(et)


def is_regular_market_hours(ts: Column) -> Column:
    """US equity regular session predicate in Eastern time (09:30-16:00
    Mon-Fri, holiday-aware).  Sessions are half-open [09:30, 16:00) at
    minute granularity; the reference's inclusive `<= 16:00` differs
    only at the single instant 16:00:00.000000 (documented divergence —
    the half-open form composes cleanly with the after-hours interval).
    """
    m = _session_minutes(ts)
    return is_trading_day(ts) & (m >= MARKET_OPEN_MIN) & (m < MARKET_CLOSE_MIN)


def is_extended_market_hours(ts: Column) -> Column:
    """Pre-market [04:00, 09:30) or after-hours [16:00, 20:00) on a
    trading day (reference is_extended_hours)."""
    m = _session_minutes(ts)
    pre = (m >= PRE_MARKET_OPEN_MIN) & (m < MARKET_OPEN_MIN)
    after = (m >= MARKET_CLOSE_MIN) & (m < AFTER_HOURS_CLOSE_MIN)
    return is_trading_day(ts) & (pre | after)


def is_market_open(ts: Column, include_extended: bool = False) -> Column:
    """Reference is_market_open: regular session, optionally widened to
    the extended sessions."""
    if include_extended:
        return is_regular_market_hours(ts) | is_extended_market_hours(ts)
    return is_regular_market_hours(ts)


def market_session(ts: Column) -> Column:
    """Classify an (assumed-UTC) event timestamp into
    'pre_market' | 'regular' | 'after_hours' | 'closed' — the
    reference's three boolean checks folded into one label column."""
    m = _session_minutes(ts)
    trading = is_trading_day(ts)
    return (
        F.when(trading & (m >= MARKET_OPEN_MIN) & (m < MARKET_CLOSE_MIN), F.lit("regular"))
        .when(trading & (m >= PRE_MARKET_OPEN_MIN) & (m < MARKET_OPEN_MIN), F.lit("pre_market"))
        .when(trading & (m >= MARKET_CLOSE_MIN) & (m < AFTER_HOURS_CLOSE_MIN), F.lit("after_hours"))
        .otherwise(F.lit("closed"))
    )
