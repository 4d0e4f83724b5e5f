"""One arm of the curated drain/finalize worktree A/B (round-16 task 1).

Usage: python scripts/ab_drain_one.py <repo_root> <out_json>

Runs bench.py's bench_curated_pipeline (the harness is byte-identical
between the r14 arm and HEAD — `git diff 570addc..HEAD -- bench.py`
touches only digest emission) against the package code found under
<repo_root>, in a FRESH JVM, and appends one JSON line with the three
timings to <out_json>.  The caller interleaves arms A/B/A/B so host
drift hits both arms symmetrically — the adjudication the round-15
calibration probe could not provide.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    root, out_path = sys.argv[1], sys.argv[2]
    root = os.path.abspath(root)
    # Both the driver import and the Python workers must resolve the
    # package from THIS arm's root (PYTHONPATH is set by the caller too,
    # so forked workers inherit it).
    sys.path.insert(0, root)
    import bench  # noqa: E402  — the arm root's bench.py

    assert bench.__file__.startswith(root), bench.__file__
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = bench.get_spark(app_name="ab_drain")
    # same warmup as bench.main: pay JVM/codegen startup outside the timing
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    timings = bench.bench_curated_pipeline(spark, sf_dir)
    wall = round(time.perf_counter() - t0, 3)
    rec = {"root": root, "wall": wall, **timings}
    with open(out_path, "a", encoding="utf-8") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
