"""Avro wire format + schema governance (reference S9 parity).

The reference registers Avro schemas with BACKWARD compatibility
(`scripts/register_schemas.py:17-20,122`, `schemas/avro/trade.avsc`,
`schemas/avro/quote.avsc`) but actually ships JSON on the Kafka wire
(`src/producer/kafka_producer.py:83` json.dumps) — Avro is governance
only.  This module mirrors that split:

- the schema CONSTANTS and the BACKWARD-compatibility checker are pure
  Python, always available (the governance half);
- `trades_to_avro` / `trades_from_avro` use Spark's `to_avro`/`from_avro`
  column functions (the wire half), which need the external spark-avro
  data source on the session classpath.  This container does not ship
  that jar, so the wire half is gated behind `avro_available()` and
  raises a clear error naming the missing package otherwise — the plan
  construction, schema strings, and compatibility rules are all real and
  tested either way.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Field-for-field parity with reference schemas/avro/trade.avsc — the
# semantic content (names, types, defaults), not the prose docs.
TRADE_AVRO_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Trade",
        "namespace": "engine.market",
        "fields": [
            {"name": "symbol", "type": "string"},
            {"name": "price", "type": "double"},
            {"name": "volume", "type": "long"},
            {"name": "timestamp", "type": "long"},
            {"name": "conditions", "type": {"type": "array", "items": "string"}, "default": []},
            {"name": "ingestion_time", "type": "long"},
        ],
    }
)

# reference schemas/avro/quote.avsc
QUOTE_AVRO_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Quote",
        "namespace": "engine.market",
        "fields": [
            {"name": "symbol", "type": "string"},
            {"name": "bid_price", "type": "double"},
            {"name": "bid_size", "type": "long"},
            {"name": "ask_price", "type": "double"},
            {"name": "ask_size", "type": "long"},
            {"name": "timestamp", "type": "long"},
            {"name": "ingestion_time", "type": "long"},
        ],
    }
)


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro data source is usable.  Probed by
    ANALYZING (not executing) a one-column to_avro projection: Spark 4
    ships the function stubs either way and only fails analysis with
    AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE when the data source jar is
    absent — a classpath check alone cannot tell the two apart."""
    try:
        from pyspark.sql.avro.functions import to_avro

        probe = spark.range(1).select(F.struct(F.col("id")).alias("s"))
        probe.select(to_avro("s")).schema  # noqa: B018 — analysis triggers the check
        return True
    except Exception:
        return False


_MISSING = (
    "the spark-avro data source is not on the classpath; start the session "
    "with e.g. spark.jars.packages=org.apache.spark:spark-avro_2.13:<spark-version> "
    "(reference parity note: the reference also never ships Avro bytes — "
    "its Kafka wire format is JSON; Avro is registered for governance only)"
)


def trades_to_avro(df: DataFrame, schema: str = TRADE_AVRO_SCHEMA) -> Column:
    """struct(all trade wire fields) -> Avro binary column `value`."""
    from pyspark.sql.avro.functions import to_avro

    if not avro_available(df.sparkSession):
        raise ModuleNotFoundError(_MISSING)
    fields = [f["name"] for f in json.loads(schema)["fields"]]
    return to_avro(F.struct(*[F.col(c) for c in fields]), schema).alias("value")


def trades_from_avro(
    df: DataFrame, value_col: str = "value", schema: str = TRADE_AVRO_SCHEMA
) -> DataFrame:
    """Avro binary `value` column -> expanded trade columns."""
    from pyspark.sql.avro.functions import from_avro

    if not avro_available(df.sparkSession):
        raise ModuleNotFoundError(_MISSING)
    return df.select(from_avro(F.col(value_col), schema).alias("t")).select("t.*")


# ---------------------------------------------------------------------------
# BACKWARD compatibility (the schema-registry rule the reference sets):
# a consumer compiled against the NEW schema must be able to read data
# written with the OLD schema.
# ---------------------------------------------------------------------------

_PROMOTIONS = {  # Avro spec numeric/string promotions (writer -> readers)
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
}


def _type_name(t) -> str | None:
    if isinstance(t, str):
        return t
    if isinstance(t, dict):
        return t.get("type")
    return None


def _types_compatible(writer_t, reader_t) -> bool:
    w, r = _type_name(writer_t), _type_name(reader_t)
    if w == r and w in ("record", "array", "map"):
        if w == "array":
            return _types_compatible(writer_t["items"], reader_t["items"])
        if w == "map":
            return _types_compatible(writer_t["values"], reader_t["values"])
        return backward_incompatibilities(writer_t, reader_t) == []
    if w == r:
        return True
    return r in _PROMOTIONS.get(w, set())


def backward_incompatibilities(old_schema, new_schema) -> list[str]:
    """Why `new_schema` CANNOT read data written with `old_schema`
    (empty list = BACKWARD compatible).  Rules checked (Avro spec
    resolution): new fields without defaults, removed-then-re-read
    fields are fine (reader drops them), type changes outside the
    promotion lattice.
    """
    old = json.loads(old_schema) if isinstance(old_schema, str) else old_schema
    new = json.loads(new_schema) if isinstance(new_schema, str) else new_schema
    problems: list[str] = []
    old_fields = {f["name"]: f for f in old.get("fields", [])}
    for f in new.get("fields", []):
        name = f["name"]
        if name not in old_fields:
            if "default" not in f:
                problems.append(
                    f"new field '{name}' has no default — old data cannot be read"
                )
            continue
        if not _types_compatible(old_fields[name]["type"], f["type"]):
            problems.append(
                f"field '{name}' type changed incompatibly: "
                f"{old_fields[name]['type']!r} -> {f['type']!r}"
            )
    return problems


def is_backward_compatible(old_schema, new_schema) -> bool:
    return backward_incompatibilities(old_schema, new_schema) == []
