"""Dtype-faithful Spark-vs-DuckDB result comparison.

The external correctness driver compares row count, schema, and an
order-insensitive value hash.  Round 3 shipped three driver-red rows
because the local harness normalized values through Python ``repr``,
which silently coerces DuckDB HUGEINT (the result dtype of ``SUM`` over
BIGINT) to ``int`` — schema-identical locally, schema-red at the
driver.  This module closes that hole: both engines' column types are
mapped onto one canonical vocabulary and compared literally, so a
HUGEINT oracle column fails locally exactly the way it fails remotely.

Canonical vocabulary (lower-case):
    int int128 uint float string bool binary date time timestamp
    decimal(p,s) list<...>

Calibration against the driver (round 3 red rows + round 4 green set):
the driver tolerates signed-int WIDTH skew — three driver-green queries
(`window_top3_customers_per_nation`, `ship_delay_by_month`,
`multimodal_decode_features`) carry int32-vs-int64 columns — but flags
HUGEINT against BIGINT (its pandas/Arrow conversion turns HUGEINT into
float64, breaking both schema and value hash). So signed widths
collapse to one ``int`` class while HUGEINT stays the distinct
``int128``: ``SUM(bigint)`` must be CAST to BIGINT in every oracle.
"""

from __future__ import annotations

import math
import re

# -- DuckDB ---------------------------------------------------------------

_DUCK_SCALARS = {
    "tinyint": "int",
    "smallint": "int",
    "integer": "int",
    "int": "int",
    "bigint": "int",
    "hugeint": "int128",
    "utinyint": "uint",
    "usmallint": "uint",
    "uinteger": "uint",
    "ubigint": "uint",
    "float": "float",
    "real": "float",
    "double": "float",
    "varchar": "string",
    "text": "string",
    "boolean": "bool",
    "blob": "binary",
    "date": "date",
    "time": "time",
}


def canon_duck_type(t: str) -> str:
    s = str(t).strip().lower()
    if s.endswith("[]"):
        return f"list<{canon_duck_type(s[:-2])}>"
    if s.startswith("timestamp"):
        return "timestamp"
    m = re.match(r"decimal\((\d+),\s*(\d+)\)", s)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    return _DUCK_SCALARS.get(s, s)


# -- Spark ----------------------------------------------------------------

_SPARK_SCALARS = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "integer": "int",
    "bigint": "int",
    "long": "int",
    "float": "float",
    "double": "float",
    "string": "string",
    "boolean": "bool",
    "binary": "binary",
    "date": "date",
}


def canon_spark_type(t: str) -> str:
    """Canonicalize a Spark DataType ``simpleString`` (e.g. ``bigint``,
    ``array<double>``, ``decimal(18,3)``)."""
    s = str(t).strip().lower()
    m = re.match(r"array<(.*)>$", s)
    if m:
        return f"list<{canon_spark_type(m.group(1))}>"
    if s.startswith("timestamp"):  # timestamp / timestamp_ntz
        return "timestamp"
    m = re.match(r"decimal\((\d+),\s*(\d+)\)", s)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    return _SPARK_SCALARS.get(s, s)


# -- comparison -----------------------------------------------------------


def spark_schema_map(sdf) -> dict[str, str]:
    return {f.name: canon_spark_type(f.dataType.simpleString()) for f in sdf.schema.fields}


def duck_schema_map(rel) -> dict[str, str]:
    return {c: canon_duck_type(t) for c, t in zip(rel.columns, rel.types)}


def schema_mismatches(spark_types: dict[str, str], duck_types: dict[str, str]) -> list[str]:
    """Human-readable per-column dtype differences (empty = match)."""
    out = []
    for col in sorted(set(spark_types) | set(duck_types)):
        st, dt = spark_types.get(col), duck_types.get(col)
        if st != dt:
            out.append(f"{col}: spark={st} duck={dt}")
    return out


def norm_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return repr(v)


def rowset(cols, rows):
    """Rows as sorted tuples of normalized values, columns sorted by
    name — the driver's order-insensitive value hash, locally."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_value(r[i]) for i in order) for r in rows)
