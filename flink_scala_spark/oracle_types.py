"""Typed comparison between Spark results and DuckDB oracle results.

The driver's correctness gate hashes *typed* values, so an oracle whose
final projection emits DuckDB HUGEINT (int128 — what an uncast integer
``sum()`` returns) hash-mismatches a Spark BIGINT even though ``str()``
of every cell is identical. Round 3 lost two otherwise-correct queries
to exactly this. DuckDB's DB-API ``description`` reports only
``'NUMBER'``, and its ``fetchall`` converts HUGEINT to plain Python
``int``, so neither cursor metadata nor Python value types can see the
drift — but the Arrow schema can: HUGEINT surfaces as
``decimal128(38, 0)`` while BIGINT is ``int64``.

``arrow_to_spark_dtype`` canonicalizes an Arrow type to the Spark
simpleString dtype it would round-trip as; comparing those strings
column-by-column makes oracle/engine type drift a hard local failure
before the driver ever sees it (VERDICT r3 "What's wrong" #1/#2).
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["arrow_to_spark_dtype", "dtype_mismatches"]


def arrow_to_spark_dtype(t: "pa.DataType") -> str:
    """Canonical Spark dtype string for an Arrow type (drift-visible)."""
    if pa.types.is_int64(t):
        return "bigint"
    if pa.types.is_int32(t):
        return "int"
    if pa.types.is_int16(t):
        return "smallint"
    if pa.types.is_int8(t):
        return "tinyint"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{arrow_to_spark_dtype(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{f.name}:{arrow_to_spark_dtype(f.type)}" for f in t
        )
        return f"struct<{inner}>"
    return str(t)


def _norm_spark_dtype(dt: str) -> str:
    # Spark reports tz-naive timestamps as timestamp_ntz in some paths;
    # DuckDB's TIMESTAMP is naive too — same wire value, same hash.
    return "timestamp" if dt in ("timestamp_ntz", "timestamp") else dt


def dtype_mismatches(spark_dtypes, arrow_schema) -> list[str]:
    """Column-name-keyed dtype diffs between a Spark result and the
    oracle's Arrow schema. Empty list == types agree everywhere.

    ``spark_dtypes``: ``df.dtypes`` (list of (name, dtype) pairs).
    ``arrow_schema``: ``con.execute(sql).fetch_arrow_table().schema``.
    """
    duck = {f.name: arrow_to_spark_dtype(f.type) for f in arrow_schema}
    out = []
    for name, sdt in spark_dtypes:
        if name not in duck:
            continue  # column-name drift is reported separately
        s, d = _norm_spark_dtype(sdt), _norm_spark_dtype(duck[name])
        if s != d:
            out.append(f"col {name}: spark={s} oracle={d}")
    return out
