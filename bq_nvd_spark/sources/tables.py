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
# rejects by default. Session construction sets
# spark.sql.legacy.parquet.nanosAsLong (see session.py) so they scan as
# epoch-nanos longs; the scan layer converts to microsecond timestamps
# with floor division (exact for pre-epoch values too; the test data has
# no sub-microsecond components, so this matches DuckDB's semantics).
_NANOS_TS_COLUMNS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLUMNS.get(name, ()):
        if isinstance(df.schema[col].dataType, LongType):
            # `div` truncates toward zero; for negative (pre-1970) nanos we
            # need floor semantics, so shift negatives down by 999 first.
            micros = F.expr(f"if({col} >= 0, {col} div 1000, ({col} - 999) div 1000)")
            df = df.withColumn(col, F.timestamp_micros(micros))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every star-schema table as a temp view for Spark SQL use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
