"""Parquet scan layer for the driver star schema (SURVEY.md §2.1 S8).

All reads go through ``spark.read.parquet`` so Catalyst gets a pushdown- and
pruning-capable scan node: filters land in ``PushedFilters`` and projections
in ``ReadSchema`` — at 100 TB that is the difference between scanning
kilobytes and scanning the lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Parquet columns that carry TIMESTAMP(NANOS) physical type, which Spark
# rejects by default. With spark.sql.legacy.parquet.nanosAsLong they scan
# as epoch-nanos longs; we convert to microsecond timestamps at the scan
# (the test data has no sub-microsecond components, so this is lossless
# and matches DuckDB's value semantics).
_NANOS_TS_COLUMNS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name in _NANOS_TS_COLUMNS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLUMNS.get(name, ()):
        if isinstance(df.schema[col].dataType, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every star-schema table as a temp view for Spark SQL use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
