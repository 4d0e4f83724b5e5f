"""Standing-gate oracle sweep (round-14 VERDICT task 2): run EVERY
oracle-backed query through the DuckDB comparison at one scale factor
and print a one-line summary — the same compare (typed value hash,
sorted columns) the driver and tests/test_oracle_parity.py use.

    python scripts/oracle_sweep.py [sf_dir]     # default /root/testdata/sf0.1

The gate (since round 10): after all of a round's changes, this must
report N/N at BOTH sf0.01 and sf0.1, and the numbers go in NOTES.md.
sf0.01 is also covered by the pytest suite / the driver; the sf0.1 half
has caught real issues the small SF missed (the r10 minhash fix).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)  # tests.oracle_harness is not installed

    from real_time_financial_market_data_pipeline_spark.serving.queries import ORACLE_SQL, QUERIES
    from real_time_financial_market_data_pipeline_spark.session import get_spark
    from tests.oracle_harness import compare, duck_connection

    spark = get_spark(app_name="oracle_sweep")
    con = duck_connection(sf_dir)
    t0 = time.perf_counter()
    failures: dict[str, list[str]] = {}
    for name in sorted(ORACLE_SQL):
        t = time.perf_counter()
        problems = compare(QUERIES[name](spark, sf_dir), con, ORACLE_SQL[name])
        if problems:
            failures[name] = problems
        print(
            f"  {name}: {'FAIL' if problems else 'ok'} "
            f"({time.perf_counter() - t:.1f}s)",
            flush=True,
        )
    summary = {
        "oracle_sweep": True,
        "sf_dir": sf_dir,
        "passed": len(ORACLE_SQL) - len(failures),
        "total": len(ORACLE_SQL),
        "elapsed_s": round(time.perf_counter() - t0, 1),
        "failures": {k: v[:3] for k, v in failures.items()},
    }
    spark.stop()
    print(json.dumps(summary))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
