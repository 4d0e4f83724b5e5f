"""Physical-plan inspection helpers.

The 100 TB posture is only real if the plans prove it: filters reaching
the parquet scan, projections pruned to the read schema, small dims
broadcast, shuffle count matching the algorithm's minimum. These
helpers make those properties assertable in tests instead of eyeballed
in .explain output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def _executed_plan_str(df: DataFrame) -> str:
    # force AQE finalization by looking at the executed plan after an action
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all parquet scans in the plan."""
    plan = physical_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each file scan — the pruned column set actually read."""
    plan = physical_plan(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def scan_tables_and_schemas(df: DataFrame) -> list[tuple[str, str]]:
    """(source table, untruncated ReadSchema) for each file scan in the
    plan — the exact pruned column set read from each input.  Used by the
    plan-snapshot sweep: a refactor that widens a scan (column pruning
    lost) or adds/drops a scan diffs against the recorded snapshot.

    ReadSchema strings are truncated at spark.sql.maxMetadataStringLength
    (default 100 chars) in explain output; the conf is raised for the
    duration of the rendering so the snapshot captures the full schema.
    """
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    prev = spark.conf.get(key)
    spark.conf.set(key, "100000")
    try:
        plan = physical_plan(df)
    finally:
        spark.conf.set(key, prev)
    out: list[tuple[str, str]] = []
    location = "?"
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("Location:"):
            m = re.search(r"\[([^\],]+)", line)
            location = m.group(1).rstrip("/").rsplit("/", 1)[-1] if m else "?"
            location = re.sub(r"\.parquet$", "", location)
        elif line.startswith("ReadSchema:"):
            out.append((location, line.split("ReadSchema:", 1)[1].strip()))
    return out


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def count_shuffles(df: DataFrame) -> int:
    """Number of data-moving Exchange (shuffle) operators in the plan.
    Broadcast exchanges are excluded — they move only the small side."""
    plan = physical_plan(df, "simple")
    return len(
        re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan)
    )
