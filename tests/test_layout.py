"""Data-layout operators: Z-order locality, compaction, partition pruning.

These pin the WRITE-side scale levers: a Z-order write must actually
shrink per-file bounding boxes (that is what makes parquet min/max stats
prunable on two dimensions at once), compaction must actually reduce file
count without losing rows, and a partitioned layout must let Catalyst
inject dynamic partition pruning on the fact side of a star join.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from bq_nvd_spark.operators.layout import (
    compact_parquet,
    morton_code,
    morton_sql,
    zorder_partitions,
)
from bq_nvd_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _py_morton(a: int, b: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_morton_column_and_sql_agree_with_reference(spark):
    """The Column expression, the portable SQL text, and a plain Python
    reference implementation all produce the same interleave for every
    point of the 32x32 grid."""
    grid = spark.range(32 * 32).select(
        (F.col("id") % 32).alias("a"), (F.col("id") / 32).cast("long").alias("b")
    )
    rows = (
        grid.select(
            "a",
            "b",
            morton_code(F.col("a"), F.col("b"), 5).alias("z_col"),
            F.expr(morton_sql("a", "b", 5)).alias("z_sql"),
        )
        .collect()
    )
    assert len(rows) == 1024
    for r in rows:
        expect = _py_morton(r["a"], r["b"], 5)
        assert r["z_col"] == expect and r["z_sql"] == expect


def _file_boxes(spark, path):
    """Per-output-file bounding-box areas over the (hb, vb) plane."""
    df = spark.read.parquet(path).withColumn("f", F.input_file_name())
    rows = (
        df.groupBy("f")
        .agg(
            F.min("hb").alias("h0"),
            F.max("hb").alias("h1"),
            F.min("vb").alias("v0"),
            F.max("vb").alias("v1"),
        )
        .collect()
    )
    return [(r["h1"] - r["h0"] + 1) * (r["v1"] - r["v0"] + 1) for r in rows]


def test_zorder_write_shrinks_file_bounding_boxes(spark, tmp_path):
    """After a Z-order write, each file's (hour, value-bucket) bounding box
    covers a small corner of the domain; an unordered write leaves every
    file covering essentially all of it. The shrunken boxes are precisely
    what row-group min/max pruning needs to skip files on either dimension."""
    ev = load_table(spark, SF, "events").select("ts", "value")
    stats = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    cells = ev.crossJoin(F.broadcast(stats)).select(
        F.hour("ts").cast("long").alias("hb"),
        F.least(
            F.lit(31),
            F.floor(
                ((F.col("value") - F.col("vmin")) / (F.col("vmax") - F.col("vmin")))
                * 32
            ),
        )
        .cast("long")
        .alias("vb"),
    )
    z = cells.withColumn("z", morton_code(F.col("hb"), F.col("vb"), 5))

    unordered = str(tmp_path / "unordered")
    z.repartition(8).write.parquet(unordered)
    zordered = str(tmp_path / "zordered")
    zorder_partitions(z, F.col("z"), 8).write.parquet(zordered)

    base = _file_boxes(spark, unordered)
    clustered = _file_boxes(spark, zordered)
    assert spark.read.parquet(zordered).count() == z.count()
    # every unordered file ~ covers the whole 24x32 domain; z-ordered files
    # must average well under half of it.
    assert sum(clustered) / len(clustered) < 0.5 * sum(base) / len(base)


def test_compact_parquet_reduces_file_count_preserving_rows(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    small = str(tmp_path / "small_files")
    ev.repartition(64).write.parquet(small)
    n_small = len([f for f in __import__("os").listdir(small) if f.endswith(".parquet")])
    assert n_small == 64

    compacted = str(tmp_path / "compacted")
    n_out = compact_parquet(spark, small, compacted, target_file_bytes=1 << 30)
    assert n_out < 8
    assert spark.read.parquet(compacted).count() == ev.count()


def test_partitioned_write_enables_dynamic_partition_pruning(spark, tmp_path):
    """A fact table written partitioned by its join key gets a runtime
    partition filter injected from the filtered dimension side (DPP): the
    scan never lists, let alone reads, partitions the dim filter excludes.
    At 100 TB this is the difference between reading one event type's
    directory and reading the lake."""
    ev = load_table(spark, SF, "events")
    part_dir = str(tmp_path / "events_by_type")
    ev.write.partitionBy("event_type").parquet(part_dir)

    fact = spark.read.parquet(part_dir)
    dim = spark.createDataFrame(
        [(t, i) for i, t in enumerate(["click", "view", "purchase", "error"])],
        ["etype", "rank"],
    ).filter(F.col("rank") == 0)
    joined = fact.join(dim, fact["event_type"] == dim["etype"]).groupBy("etype").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    # and the pruned result matches a plain filter
    expected = ev.filter(F.col("event_type") == "click").count()
    got = {r["etype"]: r["n"] for r in joined.collect()}
    assert got.get("click", 0) == expected
