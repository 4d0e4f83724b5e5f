"""Shared fault-injection harness for exhaustive crash-point sweeps.

Used by tests/test_compaction_guard.py (staged-publish protocol of
sinks.compact_latest_state) and tests/test_curation_pipeline.py (the
span-postings settled-recording + fused-prune protocol).  The idea:
count every Python-side filesystem mutation a protocol run performs
under one root, then re-run it crashing at each mutation index and
assert the protocol's reader/recovery invariants after every one —
no hand-picked windows.

Primitive coverage audit (round 15): the protocol sources use exactly
rename/replace/remove/makedirs/rmtree/link plus plain open() for
marker/tombstone files (those are swept by state enumeration instead —
see the fold test) and shutil.copy2 only as publish_bucketed's
cross-device fallback for os.link (never taken on a same-device run,
and protocol-equivalent to the link when it is).
"""

from __future__ import annotations

import os


class _SimCrash(RuntimeError):
    """Not an OSError: the protocols' tolerated-failure except clauses
    (e.g. _clear_retire_pending's `except OSError: pass`) must not
    swallow a simulated crash."""


class _FsCrasher:
    """Counts Python-side filesystem mutations that touch `root` —
    for two-path primitives (rename/replace/link) EITHER the source or
    the destination under root counts, so a future staging-from-tempdir
    change (source outside root, destination inside) cannot silently
    shrink the sweep (round-15 ADVICE) — raising _SimCrash INSTEAD of
    executing the `crash_at`-th one (1-based).  crash_at=None = count
    only.  Spark's parquet writes are JVM-side and invisible to this
    wrapper, so the mutation sequence is exactly the protocol's own
    Python steps and is deterministic run to run.

    NOT thread-safe: installation monkeypatches os/shutil
    module-globally and assumes serial execution — one active crasher,
    no concurrent foreign filesystem activity under ANY root (the
    mid-drain sweep installs it from a foreachBatch callback while the
    driver thread is idle between batches, which satisfies this;
    pytest-xdist or a second live query touching a swept path would
    not).  __enter__ asserts no other crasher is active."""

    _PRIMS = ("rename", "replace", "remove", "makedirs", "link")
    _TWO_PATH = ("rename", "replace", "link")
    _active: "_FsCrasher | None" = None

    def __init__(self, root: str) -> None:
        import shutil

        self.root = os.path.realpath(root) + os.sep
        self.count = 0
        self.crash_at: int | None = None
        self._targets = [(os, n) for n in self._PRIMS] + [(shutil, "rmtree")]
        self._orig: list = []

    def _under_root(self, p) -> bool:
        return isinstance(p, str) and (
            os.path.realpath(p) + os.sep
        ).startswith(self.root)

    def _wrap(self, fn):
        two_path = fn.__name__ in self._TWO_PATH

        def wrapped(target, *a, **kw):
            hit = self._under_root(target) or (
                two_path and a and self._under_root(a[0])
            )
            if hit:
                self.count += 1
                if self.crash_at is not None and self.count == self.crash_at:
                    raise _SimCrash(
                        f"simulated crash at mutation {self.count}: "
                        f"{fn.__name__}({target})"
                    )
            return fn(target, *a, **kw)

        return wrapped

    def __enter__(self) -> "_FsCrasher":
        assert _FsCrasher._active is None, (
            "nested/concurrent _FsCrasher use: the module-global "
            "monkeypatch assumes serial execution"
        )
        _FsCrasher._active = self
        for mod, name in self._targets:
            fn = getattr(mod, name)
            self._orig.append((mod, name, fn))
            setattr(mod, name, self._wrap(fn))
        return self

    def __exit__(self, *exc) -> None:
        for mod, name, fn in self._orig:
            setattr(mod, name, fn)
        _FsCrasher._active = None
