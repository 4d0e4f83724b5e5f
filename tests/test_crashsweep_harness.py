"""Unit pins for the fault-injection harness itself (round-15 ADVICE):
two-path primitives must count when EITHER endpoint is under the swept
root (a staging-from-tempdir protocol change must not silently shrink
the sweep), a crashed mutation must not have executed, and concurrent
installation must be rejected, since the monkeypatch is module-global."""

from __future__ import annotations

import os

import pytest

from crashsweep import _FsCrasher, _SimCrash


def test_counts_first_path_under_root(tmp_path):
    root = tmp_path / "root"
    root.mkdir()
    (root / "a").write_text("x")
    with _FsCrasher(str(root)) as c:
        os.rename(str(root / "a"), str(root / "b"))
    assert c.count == 1


def test_counts_dest_only_rename_from_outside_root(tmp_path):
    # the ADVICE case: source OUTSIDE the swept root, destination
    # inside — e.g. a future protocol staging from a tempdir
    root = tmp_path / "root"
    root.mkdir()
    outside = tmp_path / "stage"
    outside.write_text("x")
    with _FsCrasher(str(root)) as c:
        os.rename(str(outside), str(root / "landed"))
    assert c.count == 1, "dest-under-root rename was not counted"


def test_crash_prevents_the_mutation(tmp_path):
    root = tmp_path / "root"
    root.mkdir()
    src = root / "a"
    src.write_text("x")
    with _FsCrasher(str(root)) as c:
        c.crash_at = 1
        with pytest.raises(_SimCrash):
            os.rename(str(src), str(root / "b"))
    assert src.exists() and not (root / "b").exists()


def test_untouched_paths_not_counted_or_crashed(tmp_path):
    root = tmp_path / "root"
    root.mkdir()
    other = tmp_path / "elsewhere"
    other.mkdir()
    (other / "a").write_text("x")
    with _FsCrasher(str(root)) as c:
        c.crash_at = 1
        os.rename(str(other / "a"), str(other / "b"))  # must not raise
    assert c.count == 0


def test_concurrent_installation_rejected(tmp_path):
    with _FsCrasher(str(tmp_path)):
        with pytest.raises(AssertionError):
            with _FsCrasher(str(tmp_path)):
                pass  # pragma: no cover
    # and the outer exit restores cleanliness for a fresh use
    with _FsCrasher(str(tmp_path)) as c:
        pass
    assert c.count == 0


def test_primitives_restored_after_exit(tmp_path):
    orig = (os.rename, os.replace, os.remove, os.makedirs, os.link)
    with _FsCrasher(str(tmp_path)):
        assert os.rename is not orig[0]
    assert (os.rename, os.replace, os.remove, os.makedirs, os.link) == orig
