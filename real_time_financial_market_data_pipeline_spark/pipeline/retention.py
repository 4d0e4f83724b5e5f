"""TTL retention for date-partitioned tables.

Capability parity: the reference leaned on Cassandra
`default_time_to_live` (bronze 7d / silver 30d / gold_5m 90d / gold_1h
365d — schemas/cassandra/keyspace.cql:37,63,91,119). On parquet/lake
storage the equivalent is partition-level deletion: drop whole
`<date_col>=<day>` directories past the cutoff. Partition-granular →
no row rewrites, O(#expired-partitions) metadata work regardless of
data volume.
"""

from __future__ import annotations

import datetime as _dt
import os
import re
import shutil

# The reference's retention envelope (days), by layer.
DEFAULT_TTL_DAYS = {"bronze": 7, "silver": 30, "gold_5m": 90, "gold_1h": 365}


def expired_partitions(
    table_path: str,
    keep_days: int,
    now: _dt.date,
    date_col: str = "trade_date",
) -> list[str]:
    """Partition directories strictly older than now - keep_days."""
    cutoff = now - _dt.timedelta(days=keep_days)
    out = []
    if not os.path.isdir(table_path):
        return out
    pat = re.compile(re.escape(date_col) + r"=(\d{4}-\d{2}-\d{2})$")
    for entry in sorted(os.listdir(table_path)):
        m = pat.match(entry)
        if m and _dt.date.fromisoformat(m.group(1)) < cutoff:
            out.append(os.path.join(table_path, entry))
    return out


def apply_retention(
    table_path: str,
    keep_days: int,
    now: _dt.date | None = None,
    date_col: str = "trade_date",
    dry_run: bool = False,
) -> list[str]:
    """Delete expired partition dirs; returns the paths removed (or that
    would be removed under dry_run)."""
    now = now or _dt.date.today()
    doomed = expired_partitions(table_path, keep_days, now, date_col)
    if not dry_run:
        for d in doomed:
            shutil.rmtree(d)
    return doomed
