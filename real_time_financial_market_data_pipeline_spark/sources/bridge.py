"""Reconnecting feed bridge: push-source → replayable spool files.

Capability parity for the reference's WebSocket client lifecycle
(S2, reference src/producer/finnhub_client.py:121-133): exponential
backoff reconnect `min(base * 2^attempt, cap)` seconds and the
50-symbol subscription cap.  The reference runs that logic inside its
producer process; Spark's socket source is non-replayable and keeps no
offsets, so the engine-correct place for connection management is this
bridge: it maintains the push connection, applies the reconnect
policy, and lands complete line-JSON spool files that the FILE source
(sources/streaming.read_trade_stream) consumes with checkpointed
offsets — the flaky leg is isolated in front of the exactly-once leg
instead of threaded through it.

Spool file discipline: lines append to an underscore-prefixed temp
file (invisible to Spark's file listing), which is atomically renamed
to its visible name on rotation (every `rotate_lines` lines, on
disconnect, and on shutdown) — the streaming reader only ever sees
complete files, in modification-time order.
"""

from __future__ import annotations

import logging
import os
import threading
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass, field

log = logging.getLogger(__name__)

MAX_SYMBOLS = 50  # reference finnhub_client subscription cap


@dataclass(frozen=True)
class ReconnectPolicy:
    """Exponential backoff `min(base_s * 2^attempt, cap_s)` — the SAME
    SHAPE as the reference's schedule (min(2^retry_count, 300) s), not
    the identical ladder: the reference's retry_count starts at 1 (first
    delay 2 s) and resets on successful connection, while this policy
    starts at `base_s` (attempt 0) and the bridge resets on the first
    healthy LINE — the lazy-iterator transport contract cannot observe
    "connected" before a line arrives, and resetting on lines is
    stricter for endpoints that accept connections then immediately
    drop them."""

    base_s: float = 1.0
    cap_s: float = 300.0

    def delay(self, attempt: int) -> float:
        """Seconds to wait before reconnect attempt `attempt` (0-based,
        counting CONSECUTIVE failures — callers reset on success)."""
        return min(self.base_s * (2.0 ** attempt), self.cap_s)


def subscribe_cap(symbols: list[str], max_symbols: int = MAX_SYMBOLS) -> list[str]:
    """Truncate a subscription list to the feed's cap (order-preserving,
    first-come like the reference client); logs what was dropped."""
    if len(symbols) <= max_symbols:
        return list(symbols)
    dropped = symbols[max_symbols:]
    log.warning(
        "subscription cap %d: dropping %d symbols (%s...)",
        max_symbols,
        len(dropped),
        ",".join(dropped[:5]),
    )
    return list(symbols[:max_symbols])


@dataclass
class FeedBridge:
    """Pump lines from a reconnecting push connection into spool files.

    `connect` opens one connection and returns an iterator of wire
    lines (str, no trailing newline); it raising — or the iterator
    raising mid-stream — counts as a disconnect.  Iterator exhaustion
    (clean EOF) ends the bridge without a failure.  Any transport fits
    this contract: a websocket client, a TCP socket file object, a test
    generator.

    Consecutive-failure counting: each successful line resets the
    attempt counter, so a long-lived connection that drops reconnects
    at base delay, while a flapping endpoint backs off geometrically to
    the cap — the reference client's behavior in shape (see
    ReconnectPolicy for where the concrete ladders differ).

    `max_consecutive_failures` bounds retry-forever (None = retry until
    `stop` is set); `stop.wait(delay)` makes shutdown prompt even
    mid-backoff.
    """

    connect: Callable[[], Iterable[str]]
    spool_dir: str
    policy: ReconnectPolicy = field(default_factory=ReconnectPolicy)
    rotate_lines: int = 1000
    max_consecutive_failures: int | None = None

    def __post_init__(self) -> None:
        os.makedirs(self.spool_dir, exist_ok=True)
        self.stats: dict = {"connects": 0, "failures": 0, "lines": 0, "delays": []}
        # Seed the spool sequence PAST any files already present: Spark's
        # file source tracks processed files BY NAME, so a bridge
        # restarted into an existing spool_dir that re-used feed-000000
        # would silently overwrite data the source considers done — the
        # overwritten lines would never be read (silent loss across
        # bridge process restarts).
        import re

        existing = [
            int(m.group(1))
            for f in os.listdir(self.spool_dir)
            if (m := re.fullmatch(r"feed-(\d+)\.json", f))
        ]
        self._seq = max(existing, default=-1) + 1
        self._buf: list[str] = []

    # -- spool management ---------------------------------------------------

    def _tmp_path(self) -> str:
        return os.path.join(self.spool_dir, f"_feed-{self._seq:06d}.json.tmp")

    def _flush(self) -> None:
        """Write buffered lines as ONE complete visible spool file
        (atomic rename — the file source never lists a partial file)."""
        if not self._buf:
            return
        tmp = self._tmp_path()
        with open(tmp, "w") as fh:
            fh.write("\n".join(self._buf) + "\n")
        os.rename(tmp, os.path.join(self.spool_dir, f"feed-{self._seq:06d}.json"))
        self._seq += 1
        self._buf.clear()

    # -- pump loop ----------------------------------------------------------

    def run(self, stop: threading.Event | None = None) -> dict:
        """Pump until clean EOF, `stop`, or the failure bound; returns
        stats (connects / failures / lines / backoff delays taken)."""
        stop = stop or threading.Event()
        attempt = 0
        while not stop.is_set():
            try:
                lines: Iterator[str] = iter(self.connect())
                self.stats["connects"] += 1
                while not stop.is_set():
                    try:
                        line = next(lines)
                    except StopIteration:
                        self._flush()
                        return self.stats  # clean EOF: feed is done
                    attempt = 0  # healthy connection resets the backoff
                    self._buf.append(line)
                    self.stats["lines"] += 1
                    if len(self._buf) >= self.rotate_lines:
                        self._flush()
                self._flush()
                return self.stats
            except Exception as exc:  # noqa: BLE001 — any transport error = disconnect
                self._flush()  # never strand complete lines in the buffer
                self.stats["failures"] += 1
                if (
                    self.max_consecutive_failures is not None
                    and attempt + 1 >= self.max_consecutive_failures
                ):
                    log.error("feed bridge giving up after %d consecutive failures", attempt + 1)
                    raise
                delay = self.policy.delay(attempt)
                self.stats["delays"].append(delay)
                log.warning(
                    "feed disconnected (%s: %s); reconnect attempt %d in %.1fs",
                    type(exc).__name__,
                    exc,
                    attempt + 1,
                    delay,
                )
                attempt += 1
                stop.wait(delay)
        self._flush()
        return self.stats

    def run_in_thread(self, stop: threading.Event) -> threading.Thread:
        t = threading.Thread(target=self.run, args=(stop,), daemon=True)
        t.start()
        return t
