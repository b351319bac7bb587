"""stage_checkpoint: executor-local by default, RELIABLE (checkpoint
dir, survives executor loss) when the session has one configured — the
cluster deployment path for the iterative CC / verify plans."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bq_nvd_spark.operators.checkpoint import stage_checkpoint
from bq_nvd_spark.operators.graph import connected_components


def test_local_by_default(spark, tmp_path):
    """No checkpoint dir configured → executor-local blocks, nothing on
    shared storage (the would-be dir stays empty)."""
    assert spark.sparkContext.getCheckpointDir() is None
    df = stage_checkpoint(spark.range(10))
    assert df.count() == 10
    assert not any(os.scandir(tmp_path))


def test_reliable_when_dir_configured(spark, tmp_path):
    ckdir = str(tmp_path / "ck")
    spark.sparkContext.setCheckpointDir(ckdir)
    try:
        df = stage_checkpoint(spark.range(10))
        assert df.count() == 10
        # blocks actually landed in the reliable dir
        files = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(ckdir)
            for f in fs
        ]
        assert files, "no checkpoint files written to the configured dir"
    finally:
        spark.sparkContext._jsc.sc().setCheckpointDir(None)


def test_connected_components_on_reliable_path(spark, tmp_path):
    """The CC fixpoint (the heaviest checkpoint consumer) produces the
    same clusters through the reliable path."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], ["src", "dst"]
    )
    expected = {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }
    spark.sparkContext.setCheckpointDir(str(tmp_path / "cc_ck"))
    try:
        got = {
            (r["id"], r["cluster_id"])
            for r in connected_components(edges).collect()
        }
        assert got == expected
    finally:
        spark.sparkContext._jsc.sc().setCheckpointDir(None)


def test_connected_components_local_path_unchanged(spark):
    edges = spark.createDataFrame([(5, 6), (6, 7)], ["src", "dst"])
    got = {
        (r["id"], r["cluster_id"])
        for r in connected_components(edges).collect()
    }
    assert got == {(5, 5), (6, 5), (7, 5)}


def test_verify_pipeline_on_reliable_path(spark, sf_dir, tmp_path):
    """jaccard_verified_pairs (the heaviest stage_checkpoint consumer
    after CC) must produce identical pairs through the reliable
    checkpoint path — the exact configuration a cluster deployment
    runs with."""
    from bq_nvd_spark.plans.llm import jaccard_verified_pairs

    local = {
        tuple(r) for r in jaccard_verified_pairs(spark, sf_dir).collect()
    }
    spark.sparkContext.setCheckpointDir(str(tmp_path / "verify_ck"))
    try:
        reliable = {
            tuple(r) for r in jaccard_verified_pairs(spark, sf_dir).collect()
        }
    finally:
        spark.sparkContext._jsc.sc().setCheckpointDir(None)
    assert reliable == local
    assert local, "verify pipeline returned no pairs at test SF"


def test_shape_preserved(spark):
    df = spark.range(5).select(
        F.col("id"), (F.col("id") * 2).alias("dbl")
    )
    out = stage_checkpoint(df)
    assert out.columns == ["id", "dbl"]
    assert out.orderBy("id").collect()[4]["dbl"] == 8
