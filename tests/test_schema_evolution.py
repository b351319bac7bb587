"""Schema evolution on the parquet lake (SURVEY §2.1 scan layer).

A long-lived corpus adds columns over time (a new quality score, a new
provenance field). The scan layer must read old and new files together:
``mergeSchema`` unions the footers, old rows surface the new column as
null, and a query filtering on the new column still prunes correctly.
This mirrors the lenient-ingest contract the reference gets from
BigQuery's ``ignore_unknown_values`` load option — in both systems the
reader, not the writer, absorbs drift.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from bq_nvd_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_merge_schema_unions_old_and_new_files(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    lake = str(tmp_path / "docs_lake")
    # generation 1: no quality column
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text", "lang").write.parquet(
        lake
    )
    # generation 2: adds quality
    docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "text", "lang", (F.col("n_chars") / 100).alias("quality")
    ).write.mode("append").parquet(lake)

    merged = spark.read.option("mergeSchema", "true").parquet(lake)
    assert "quality" in merged.columns
    assert merged.count() == docs.count()
    # old-generation rows surface the new column as null
    nulls = merged.filter(F.col("quality").isNull()).count()
    assert nulls == docs.filter(F.col("doc_id") % 2 == 0).count()
    # filtering on the evolved column touches only new-generation rows
    got = merged.filter(F.col("quality").isNotNull()).count()
    assert got == docs.count() - nulls


def test_explicit_schema_read_drops_unknown_and_nulls_missing(spark, tmp_path):
    """Reading with an EXPLICIT schema projects to it: columns absent
    from the schema are dropped, columns absent from the data read as
    null — the Spark-native form of load-time schema enforcement."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "gen")
    docs.select("doc_id", "text", "lang").write.parquet(path)

    declared = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("provenance", StringType()),  # not in the data
        ]
    )
    got = spark.read.schema(declared).parquet(path)
    assert got.columns == ["doc_id", "lang", "provenance"]
    assert got.filter(F.col("provenance").isNotNull()).count() == 0
    assert got.count() == docs.count()
