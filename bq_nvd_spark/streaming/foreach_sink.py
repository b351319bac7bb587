"""foreachBatch upsert sink — the warehouse-merge half of SURVEY §2.9.

``run_available_now`` (micro_batch.py) covers sinks Spark ships
(memory/files); the pattern a real deployment needs for the
reference's "load into the warehouse" step (reference bq.py:171-202
does a synchronous load per feed) is **foreachBatch**: each
micro-batch arrives as a plain DataFrame plus a monotonically
increasing ``batch_id``, and the sink merges it into a keyed store
transactionally.

The implementation here is the canonical exactly-once recipe from the
Structured Streaming guide:

- the store is a versioned parquet directory (``v{n}``) plus a
  manifest recording the last applied batch id — read-modify-write
  never overwrites the version being read;
- a replayed batch (same ``batch_id`` after a checkpoint recovery) is
  detected via the manifest and SKIPPED, which is what makes the
  at-least-once delivery of foreachBatch exactly-once in effect;
- the merge itself is a keyed UPSERT (replace-by-key): the streaming
  aggregation runs in update output mode, so each batch delivers the
  keys whose running totals changed together with their new cumulative
  values — the sink anti-joins those keys out of the store and unions
  the fresh rows in, exactly what ``MERGE INTO ... WHEN MATCHED THEN
  UPDATE WHEN NOT MATCHED THEN INSERT`` does on a lakehouse table.
  Replace-by-key is naturally idempotent under batch replay; the
  manifest check makes the skip explicit and cheap.

Scale notes (100 TB): each micro-batch merge shuffles |store-keys| +
|batch-keys| rows on the key — at warehouse scale the store side would
be a partitioned table with dynamic partition overwrite (or a MERGE
INTO on a lakehouse format); the versioned-directory store keeps the
same transactional contract with plain parquet. State never lives on
the driver — the manifest is two integers.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bq_nvd_spark.plans.registry import query
from bq_nvd_spark.streaming.micro_batch import stream_events


class ParquetUpsertStore:
    """Keyed parquet store with versioned commits and batch-id dedup."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _manifest(self) -> dict:
        path = os.path.join(self.root, "manifest.json")
        if not os.path.exists(path):
            return {"version": -1, "last_batch_id": -1}
        with open(path) as fh:
            return json.load(fh)

    def _commit(self, manifest: dict) -> None:
        tmp = os.path.join(self.root, "manifest.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(self.root, "manifest.json"))

    def current(self, spark: SparkSession) -> DataFrame | None:
        m = self._manifest()
        if m["version"] < 0:
            return None
        return spark.read.parquet(os.path.join(self.root, f"v{m['version']}"))

    def merge_batch(self, batch_df: DataFrame, batch_id: int, key: str) -> None:
        """Upsert updated keys into the store, exactly once per batch.

        ``batch_df`` carries (key, new cumulative values) for every key
        the batch changed (update output mode), so the merge replaces
        matching keys and inserts new ones — never re-adds."""
        m = self._manifest()
        if batch_id <= m["last_batch_id"]:
            return  # replayed batch after recovery — already applied
        spark = batch_df.sparkSession
        old = self.current(spark)
        if old is None:
            combined = batch_df
        else:
            kept = old.join(batch_df.select(key), on=key, how="left_anti")
            combined = kept.unionByName(batch_df)
        next_version = m["version"] + 1
        combined.write.mode("overwrite").parquet(
            os.path.join(self.root, f"v{next_version}")
        )
        self._commit({"version": next_version, "last_batch_id": batch_id})


def _staged_event_chunks(spark: SparkSession, sf_dir: str, stage_dir: str, n: int) -> None:
    """Split the events table into n parquet chunks by event-id range so
    the file stream (maxFilesPerTrigger=1) delivers n micro-batches.
    Range-by-id keeps the split deterministic; the merge result is
    split-independent anyway (integer sums commute)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hi = ev.agg(F.max("event_id")).collect()[0][0] + 1
    step = (hi + n - 1) // n
    # One partitioned write emits every chunk directory in a single pass
    # (repartition on the chunk key -> each chunk lands as one file, so
    # maxFilesPerTrigger=1 still yields exactly n micro-batches).
    (
        ev.withColumn("chunk", (F.col("event_id") / step).cast("int"))
        .repartition("chunk")
        .write.mode("overwrite")
        .partitionBy("chunk")
        .parquet(stage_dir)
    )


@query(
    "streaming_upsert_user_totals",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
    FROM events
    GROUP BY user_id
    """,
)
def streaming_upsert_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals maintained by a foreachBatch merge sink
    across 4 micro-batches; the final store must equal the one-shot
    batch aggregate (the oracle) regardless of how events were split."""
    with tempfile.TemporaryDirectory(prefix="bq_nvd_upsert_") as work:
        stage = os.path.join(work, "stage")
        _staged_event_chunks(spark, sf_dir, stage, n=4)
        store = ParquetUpsertStore(os.path.join(work, "store"))

        schema = spark.read.parquet(os.path.join(stage, "chunk=0")).schema
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(stage, "chunk=*"))
        )
        partials = raw.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("bigint")).alias(
                "cents"
            ),
        )

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            store.merge_batch(batch_df, batch_id, key="user_id")

        ckpt = os.path.join(work, "ckpt")
        # Size the state-store count to the keyspace (~150 users), not the
        # session's batch-shuffle width — same rationale and conf-restore
        # discipline as run_available_now(state_partitions=...): 32 stores
        # x per-batch snapshot I/O dominates a small-state stream.
        saved = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            (
                partials.writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
                .awaitTermination()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", saved)
        # Materialize before the tempdir vanishes.
        final = store.current(spark)
        rows = final.collect()
        return spark.createDataFrame(rows, final.schema)
