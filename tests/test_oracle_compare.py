"""The dtype-faithful comparison harness itself — the round-3 failure
class (DuckDB HUGEINT vs Spark long, repr-equal but driver-red) must be
RED locally, while the int-width skew the driver demonstrably tolerates
stays green."""

from __future__ import annotations

import duckdb

from bq_nvd_spark.oracle_compare import (
    canon_duck_type,
    canon_spark_type,
    duck_schema_map,
    norm_value,
    schema_mismatches,
)


def test_uncast_sum_is_flagged():
    """An oracle ``SUM(bigint)`` without CAST — exactly the class that
    shipped three driver-red rows in round 3 — mismatches Spark long."""
    con = duckdb.connect()
    rel = con.sql(
        "SELECT SUM(x) AS total FROM (SELECT CAST(1 AS BIGINT) AS x)"
    )
    duck = duck_schema_map(rel)
    spark = {"total": canon_spark_type("bigint")}
    assert duck["total"] == "int128"
    assert schema_mismatches(spark, duck) == ["total: spark=int duck=int128"]


def test_cast_sum_matches():
    con = duckdb.connect()
    rel = con.sql(
        "SELECT CAST(SUM(x) AS BIGINT) AS total FROM (SELECT CAST(1 AS BIGINT) AS x)"
    )
    assert schema_mismatches(
        {"total": canon_spark_type("bigint")}, duck_schema_map(rel)
    ) == []


def test_int_width_skew_tolerated():
    """The driver passes int32-vs-int64 columns (three green queries
    carry them) — signed widths collapse to one class."""
    assert canon_duck_type("INTEGER") == canon_spark_type("bigint")
    assert canon_duck_type("BIGINT") == canon_spark_type("int")


def test_nested_and_parametric_types():
    assert canon_duck_type("BIGINT[]") == "list<int>"
    assert canon_spark_type("array<bigint>") == "list<int>"
    assert canon_duck_type("DOUBLE[]") == canon_spark_type("array<double>")
    assert canon_duck_type("DECIMAL(18,3)") == canon_spark_type("decimal(18,3)")
    assert canon_duck_type("DECIMAL(38,0)") != canon_spark_type("decimal(18,3)")
    assert canon_duck_type("TIMESTAMP WITH TIME ZONE") == canon_spark_type(
        "timestamp"
    )


def test_norm_value_floats_and_lists():
    assert norm_value(float("nan")) == "NaN"
    assert norm_value(None) == "NULL"
    assert norm_value([1.5, None]) == "[1.5,NULL]"
