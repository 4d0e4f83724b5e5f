"""Mini replica of the driver's duckdb differential check: run a Spark
query and its oracle SQL on the same parquet tables, compare row count,
column names, and values **typed and exact** (order-insensitive).

Driver parity notes (learned from CORRECTNESS_r01 + VERDICT round 1):
- the driver's value hash is TYPED — DuckDB widening ``sum(BIGINT)`` to
  HUGEINT hashes differently from Spark's BIGINT even when every value
  is numerically equal.  To reproduce that here, the oracle result is
  fetched through Arrow (HUGEINT surfaces as decimal128, not int64) and
  values are compared together with their Python type class.
- no float tolerance: both sides are expected to round in the query
  itself (``round(x, n)`` in BOTH the Spark code and the oracle SQL),
  which yields bit-identical doubles.  An earlier version of this
  harness rounded to 9 digits here, which masked the HUGEINT artifact
  and let 10 driver-red queries pass locally — never again.
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


def _norm(v, *, typed: bool = True):
    """Canonical (type_tag, value) pair.  Type tags keep int / float /
    Decimal distinct — exactly the distinction the driver's typed hash
    makes (Spark BIGINT vs DuckDB HUGEINT/decimal128)."""
    if v is None:
        return ("null", None)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, Decimal):
        return ("decimal", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", v.hex())
    if isinstance(v, datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("list", tuple(_norm(x) for x in v))
    if isinstance(v, bytes):
        return ("bytes", v)
    return (type(v).__name__, v)


def _oracle_rows(con, sql: str) -> tuple[list[str], list[tuple]]:
    """Fetch through Arrow so DuckDB's widened integer types (HUGEINT →
    decimal128) keep a distinct Python type instead of collapsing to
    int via fetchall()."""
    tbl = con.execute(sql).arrow()
    cols = tbl.column_names
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    return cols, rows


def compare(spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    o_cols, o_rows = _oracle_rows(con, sql)
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
