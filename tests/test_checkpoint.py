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


def test_release_log_names_pinning_and_releasing_queries(
    spark, sf_dir, caplog
):
    """The interleaved-consumption breadcrumb: entering a top-level
    registered query releases the previous query's pinned blocks with a
    log line naming BOTH queries and the remedy, so a later
    missing-checkpoint-block crash on a held DataFrame is actionable."""
    import logging

    from bq_nvd_spark.operators.checkpoint import release_stage_checkpoints
    from bq_nvd_spark.plans import QUERIES

    # a query that stage_checkpoints (pins blocks under its own name)...
    QUERIES["customer_rfm_segments"](spark, sf_dir).count()
    # ...then another top-level query triggers the release
    with caplog.at_level(logging.INFO, "bq_nvd_spark.operators.checkpoint"):
        QUERIES["agg_count_scalar"](spark, sf_dir).count()
    msgs = [r.getMessage() for r in caplog.records]
    hit = [
        m
        for m in msgs
        if "agg_count_scalar" in m and "customer_rfm_segments" in m
    ]
    assert hit, msgs
    assert "consume each registered query's result" in hit[0]
    # nothing left pinned afterwards; releasing again is a silent no-op
    caplog.clear()
    with caplog.at_level(logging.INFO, "bq_nvd_spark.operators.checkpoint"):
        assert release_stage_checkpoints(spark) == 0
    assert not caplog.records


def test_unregistered_pins_release_anonymously(spark, caplog):
    """Blocks pinned outside any registered query (e.g. a user calling
    stage_checkpoint directly) release with the <unregistered plan>
    attribution instead of a stale query name."""
    import logging

    from bq_nvd_spark.operators.checkpoint import release_stage_checkpoints

    stage_checkpoint(spark.range(5)).count()
    with caplog.at_level(logging.INFO, "bq_nvd_spark.operators.checkpoint"):
        assert release_stage_checkpoints(spark) >= 1
    assert any(
        "<unregistered plan>" in r.getMessage() for r in caplog.records
    )
