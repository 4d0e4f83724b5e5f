"""Graceful-shutdown runner for long-lived streaming jobs.

Capability parity: reference ST10 — SIGINT/SIGTERM handlers
(src/consumer/main.py:158-167) + spark.streaming.stopGracefullyOnShutdown.

Implementation note: the signal handler must NOT call into the JVM.
Python runs handlers on the main thread, which at shutdown time is
usually blocked inside a py4j call — issuing another py4j call from the
handler interleaves two requests on one connection and corrupts the
protocol (observed as a hard crash). The handler only sets an event; a
daemon thread owns the stop_all() call on its own JVM connection.
"""

from __future__ import annotations

import signal
import threading
from types import FrameType

from real_time_financial_market_data_pipeline_spark.streaming.sinks import SinkManager


class GracefulRunner:
    def __init__(self, manager: SinkManager) -> None:
        self.manager = manager
        self._prev: dict[int, object] = {}
        self._shutdown = threading.Event()
        self._stopper: threading.Thread | None = None
        self.stopped_by_signal: int | None = None

    def _handler(self, signum: int, frame: FrameType | None) -> None:
        # async-signal-safe: flag only, no JVM traffic
        self.stopped_by_signal = signum
        self._shutdown.set()

    def _stop_loop(self) -> None:
        self._shutdown.wait()
        # only stop queries for an actual signal — restore() also sets the
        # event (to release this thread), and a run() that merely timed out
        # must NOT kill still-running queries
        if self.stopped_by_signal is not None:
            self.manager.stop_all()

    def install(self) -> "GracefulRunner":
        for sig in (signal.SIGINT, signal.SIGTERM):
            self._prev[sig] = signal.signal(sig, self._handler)
        self._stopper = threading.Thread(target=self._stop_loop, daemon=True)
        self._stopper.start()
        return self

    def restore(self) -> None:
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)  # type: ignore[arg-type]
        self._prev.clear()
        self._shutdown.set()  # release the stopper thread

    def run(self, timeout_s: float | None = None) -> bool:
        """Block until all queries terminate (or timeout); always restores
        signal handlers."""
        try:
            return self.manager.await_all(timeout_s)
        finally:
            self.restore()
