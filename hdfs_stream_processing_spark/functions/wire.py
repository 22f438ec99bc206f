"""Wire codec: delimited-string encode/decode of typed rows (SURVEY F1-F3, S7).

The reference's hottest code path: both streaming consumers decode a
comma-joined Kafka string with eight ``split(value, ',')[i].cast(T)``
expressions (/root/reference/spark_streaming/convert-to-elasticsearch.py:107-114,
convert-to-minio.py:92-99) and the replay generator encodes rows with
``concat_ws`` (/root/reference/data_generator/dataframe_to_kafka.py:74,91).

Here the decode is a single ``from_csv`` against a registered schema — one
expression instead of N redundant ``split`` calls (Catalyst does not CSE
the repeated split, so the reference re-tokenizes the string 8 times per
row), and the schema comes from the registry instead of being re-declared
by hand.  Both directions are pure built-in expressions: whole-stage
codegen applies, and the same Column works identically in batch and
Structured Streaming plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ddl_of(schema: T.StructType) -> str:
    """Valid DDL string for a StructType (``name TYPE, ...``)."""
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)


def to_wire(cols: list[Column | str], sep: str = ",") -> Column:
    """Serialize columns into one delimited string (reference generator
    semantics, dataframe_to_kafka.py:74).

    Uses ``concat_ws``; non-string columns get Spark's canonical
    string cast (shortest round-trip repr for doubles), so
    ``parse_wire(to_wire(...))`` is lossless for the registry types.
    NULL fields vanish under concat_ws — callers needing null-safe
    framing should pre-coalesce; the reference drops nulls before
    encoding (dataframe_to_kafka.py:85) and so do our pipelines.
    """
    return F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols])


def parse_wire(col: Column | str, schema: T.StructType, sep: str = ",") -> Column:
    """Decode a delimited wire string into a typed struct.

    ``from_csv`` with a declared schema replaces the reference's 8x
    ``split()[i].cast`` (convert-to-elasticsearch.py:107-114): one parse
    per row, typed fields, identical semantics.  Expand with
    ``df.select(parsed.alias("w")).select("w.*")``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.from_csv(c, ddl_of(schema), {"sep": sep})


def encode_df(df: DataFrame, key_col: str | None = None, sep: str = ",") -> DataFrame:
    """Whole-DataFrame wire encode → (key, value) string columns, the shape
    a Kafka batch/stream writer expects (replaces the reference's driver-side
    collect()-and-loop producer, dataframe_to_kafka.py:99-121, with a fully
    distributed map-only plan)."""
    value = to_wire(list(df.columns), sep=sep).alias("value")
    if key_col is None:
        key_col = df.columns[0]
    return df.select(F.col(key_col).cast("string").alias("key"), value)


def decode_df(df: DataFrame, schema: T.StructType, value_col: str = "value", sep: str = ",") -> DataFrame:
    """Whole-DataFrame wire decode: parse ``value_col`` and expand to typed
    columns (drops the raw wire column like the reference's ``.drop('value')``,
    convert-to-elasticsearch.py:115).

    Malformed input never crashes the stream: from_csv is PERMISSIVE, so
    a corrupt line yields NULL fields — compose with
    ``operators.relational.drop_nulls`` to quarantine them (the
    reference's own dropna-before-encode convention)."""
    return df.select(parse_wire(value_col, schema, sep=sep).alias("_w")).select("_w.*")
