"""Lineage-truncating materialization with a cluster-safe upgrade path.

Iterative plans (connected components) and multi-consumer subplans (the
shingle token set, the IVF corpus relations) materialize intermediate
DataFrames so later stages neither replay the upstream plan nor grow an
unbounded lineage. ``localCheckpoint`` does that cheaply but stores the
blocks on EXECUTOR disk/memory only — on a real cluster, losing an
executor discards the blocks and, because the lineage was truncated,
the job cannot recompute them (Spark docs call this out explicitly).
That trade is fine on local[32]; it is not fine for a 1000-executor
deployment.

``stage_checkpoint`` picks the right variant from session state: if the
deployer configured a reliable checkpoint directory
(``sc.setCheckpointDir(...)`` / ``spark.checkpoint.dir`` — HDFS/S3 on a
cluster), DataFrames checkpoint THERE and survive executor loss;
otherwise behavior is unchanged (executor-local). Call sites opt in by
replacing ``df.localCheckpoint(eager=True)`` with
``stage_checkpoint(df)`` — no per-call-site configuration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stage_checkpoint(df: DataFrame, *, eager: bool = True) -> DataFrame:
    """Materialize ``df`` and truncate its lineage.

    Uses a RELIABLE checkpoint (rewritable across executor loss) when
    the session has a checkpoint directory configured, else an
    executor-local one (fast, local-mode default).
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
