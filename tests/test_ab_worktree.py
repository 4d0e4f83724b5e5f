"""Unit pins for scripts/ab_worktree.py's summary arithmetic and arm-A
file-list derivation (round-16 ADVICE, medium + low).  Pure-Python —
the tool's measurement legs need worktrees and fresh JVMs; what is
pinned here is the logic the ADVICE found wrong: (1) the summary
metric set must be the UNION across all arm-A rows so a second
--group's regression cannot be silently dropped, and (2) the arm-A
checkout list must be status-aware so files deleted between --ref and
HEAD are still checked out (git checkout ref -- path recreates them)
instead of silently excluded."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "ab_worktree",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "ab_worktree.py"),
)
ab = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ab)

PKG = "real_time_financial_market_data_pipeline_spark"


def test_metric_union_across_groups():
    # two --group flags -> each row carries only its group's metrics;
    # the summary set must include both (a_rows[0] alone dropped g2)
    a_rows = [
        {"root": "/a", "g1_drain": 10.0},
        {"root": "/a", "g2_finalize": 3.0},
        {"root": "/a", "g1_drain": 11.0},
    ]
    metrics = sorted({k for r in a_rows for k in r if k != "root"})
    assert metrics == ["g1_drain", "g2_finalize"]


def test_arm_a_files_modified_and_deleted_checked_out():
    diff = "\n".join(
        [
            f"M\t{PKG}/streaming/sinks.py",
            f"D\t{PKG}/operators/legacy.py",  # deleted at HEAD: ref has it
            f"M\tbench.py",  # outside the package: excluded
            f"M\t{PKG}/README.md",  # not .py: excluded
        ]
    )
    files, added, renamed = ab.arm_a_files(diff)
    assert files == [
        f"{PKG}/streaming/sinks.py",
        f"{PKG}/operators/legacy.py",
    ]
    assert added == [] and renamed == []


def test_arm_a_files_added_files_are_warned_not_checked_out():
    # `git checkout ref -- newfile` fails for files with no ref-era
    # version — they go to the warn list, never the checkout list
    diff = f"A\t{PKG}/operators/brand_new.py"
    files, added, renamed = ab.arm_a_files(diff)
    assert files == []
    assert added == [f"{PKG}/operators/brand_new.py"]


def test_arm_a_files_rename_checks_out_old_path():
    diff = f"R087\t{PKG}/operators/old_name.py\t{PKG}/operators/new_name.py"
    files, added, renamed = ab.arm_a_files(diff)
    assert files == [f"{PKG}/operators/old_name.py"]
    assert renamed == [
        (f"{PKG}/operators/old_name.py", f"{PKG}/operators/new_name.py")
    ]


def test_arm_a_files_copy_new_path_is_head_only():
    # C: the source still exists unchanged at HEAD; only the copy
    # destination is HEAD-only
    diff = f"C075\t{PKG}/operators/src.py\t{PKG}/operators/copy.py"
    files, added, renamed = ab.arm_a_files(diff)
    assert files == []
    assert added == [f"{PKG}/operators/copy.py"]
    assert renamed == []


def test_arm_a_files_rename_into_package_from_outside_is_added(capsys):
    # round-18 ADVICE (low): R with the OLD path outside the package —
    # the ref-era module at the old path was never package source, so
    # arm A gets only the HEAD-added new path, with an explicit warning
    # (the old "copy: old path unchanged" comment was false for R)
    diff = f"R100\tscripts/helper.py\t{PKG}/operators/helper.py"
    files, added, renamed = ab.arm_a_files(diff)
    assert files == []
    assert added == [f"{PKG}/operators/helper.py"]
    assert renamed == []
    captured = capsys.readouterr()
    # round-18 ADVICE (second pass): the warning goes to stderr so a
    # caller capturing stdout for machine-readable results never
    # ingests it; stdout must stay clean
    assert "rename into the package" in captured.err
    assert "scripts/helper.py" in captured.err
    assert "rename into the package" not in captured.out
