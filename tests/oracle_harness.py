"""Mini replica of the driver's duckdb differential check: run a Spark
query and its oracle SQL on the same parquet tables, compare row count,
column names, and (order-insensitively) values with float tolerance.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from real_time_financial_market_data_pipeline_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    oracle = con.execute(sql)
    o_cols = [d[0] for d in oracle.description]
    o_rows = oracle.fetchall()
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(map(str.lower, s_cols)) != sorted(map(str.lower, o_cols)):
        problems.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")

    # reorder oracle columns into spark's column order
    idx = [o_cols.index(next(c for c in o_cols if c.lower() == sc.lower())) for sc in s_cols]
    # sort by repr: rows may mix None with values (cube/rollup null keys)
    o_sorted = sorted((tuple(_norm(r[i]) for i in idx) for r in o_rows), key=repr)
    s_sorted = sorted((tuple(_norm(v) for v in r) for r in s_rows), key=repr)
    if o_sorted != s_sorted:
        diffs = [
            (a, b) for a, b in zip(s_sorted, o_sorted) if a != b
        ][:5]
        extra_s = [r for r in s_sorted if r not in set(o_sorted)][:3]
        extra_o = [r for r in o_sorted if r not in set(s_sorted)][:3]
        problems.append(
            f"values differ; first diffs={diffs} spark-only={extra_s} oracle-only={extra_o}"
        )
    return problems
