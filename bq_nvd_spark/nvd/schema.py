"""NVD schema system — the Spark port of the reference's schema layer.

The reference declares its table schema in a 447-line BigQuery JSON schema
document and parses it recursively into ``SchemaField`` objects
(reference bq_nvd/bq.py:24-82), defaulting a missing ``type`` to STRING
and a missing ``mode`` to NULLABLE (bq.py:51-52). Here the same document
shape (re-authored as ``nvd_schema.json``, same logical field tree) is
parsed into a Spark ``StructType``:

    BQ type     → Spark type
    STRING      → StringType
    FLOAT       → DoubleType
    BOOLEAN     → BooleanType
    TIMESTAMP   → TimestampType
    RECORD      → StructType(fields)
    mode REPEATED → ArrayType(inner)
    mode NULLABLE → nullable=True

Only the six type/mode combinations above appear in the NVD schema
(SURVEY.md §1.3); the loader still accepts the rest of the common BQ
scalar types so it works as a general config-parity surface.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_SCALAR_TYPES: dict[str, DataType] = {
    "STRING": StringType(),
    "FLOAT": DoubleType(),
    "FLOAT64": DoubleType(),
    "BOOLEAN": BooleanType(),
    "BOOL": BooleanType(),
    "TIMESTAMP": TimestampType(),
    "INTEGER": LongType(),
    "INT64": LongType(),
}

_SCHEMA_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "nvd_schema.json")


def _field_to_struct_field(field: dict[str, Any]) -> StructField:
    """One BQ-JSON schema field → Spark StructField.

    Mirrors the reference's defaulting exactly: no ``type`` → STRING, no
    ``mode`` → NULLABLE (reference bq_nvd/bq.py:51-52); ``fields`` present
    → RECORD regardless of declared scalar type.
    """
    name = field["name"]
    field_type = field.get("type", "STRING").upper()
    mode = field.get("mode", "NULLABLE").upper()
    subfields = field.get("fields", [])

    if subfields:
        inner: DataType = StructType([_field_to_struct_field(f) for f in subfields])
    elif field_type == "RECORD":
        inner = StructType([])
    else:
        try:
            inner = _SCALAR_TYPES[field_type]
        except KeyError:
            raise ValueError(f"unsupported BQ type {field_type!r} for field {name!r}")

    if mode == "REPEATED":
        # BQ REPEATED: the array itself is never null (absent → []), the
        # elements carry the field's nullability.
        return StructField(name, ArrayType(inner, containsNull=True), nullable=True)
    return StructField(name, inner, nullable=True)


def parse_bq_json_schema(fields: list[dict[str, Any]]) -> StructType:
    """BQ JSON schema document (list of field dicts) → Spark StructType."""
    return StructType([_field_to_struct_field(f) for f in fields])


def load_schema_document(path: str | None = None) -> list[dict[str, Any]]:
    with open(path or _SCHEMA_PATH) as f:
        return json.load(f)


def nvd_schema(path: str | None = None) -> StructType:
    """The per-CVE-item schema (one element of ``CVE_Items``)."""
    return parse_bq_json_schema(load_schema_document(path))


def feed_schema(path: str | None = None) -> StructType:
    """Schema of a whole NVD 1.1 feed document.

    The wrapper keys (``CVE_data_type`` … ``CVE_data_timestamp``) are the
    metadata the reference discards at transform time (reference
    bq_nvd/etl.py:75-77); declaring them keeps the read lossless so the
    projection is an explicit plan step (P1), not a reader accident.
    """
    return StructType(
        [
            StructField("CVE_data_type", StringType()),
            StructField("CVE_data_format", StringType()),
            StructField("CVE_data_version", StringType()),
            StructField("CVE_data_numberOfCVEs", StringType()),
            StructField("CVE_data_timestamp", StringType()),
            StructField("CVE_Items", ArrayType(nvd_schema(path))),
        ]
    )
