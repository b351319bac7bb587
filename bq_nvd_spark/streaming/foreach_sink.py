"""foreachBatch upsert sink — the warehouse-merge half of SURVEY §2.9.

``run_available_now`` (micro_batch.py) covers sinks Spark ships
(memory/files); the pattern a real deployment needs for the
reference's "load into the warehouse" step (reference bq.py:171-202
does a synchronous load per feed) is **foreachBatch**: each
micro-batch arrives as a plain DataFrame plus a monotonically
increasing ``batch_id``, and the sink merges it into a keyed store
transactionally.

The implementation here is the canonical exactly-once recipe from the
Structured Streaming guide, with a copy-on-write *bucketed* layout so
merge cost scales with the delta, not the store:

- the store is hash-bucketed on the merge key: ``bucket =
  pmod(xxhash64(key), n_buckets)``; each bucket directory is
  independently versioned (``b{K}/v{n}``) and a manifest records, per
  bucket, the live version plus the last applied batch id.
  Read-modify-write never overwrites the version being read;
- a micro-batch only rewrites the buckets its keys hash into.  A
  small delta against a huge store touches few buckets, so rewrite
  bytes ~ |touched buckets| x bucket size ~ O(|delta|) once
  ``n_buckets`` is sized so a bucket fits a file-group (the same
  copy-on-write contract a lakehouse MERGE INTO gives);
- a replayed batch (same ``batch_id`` after a checkpoint recovery) is
  detected via the manifest and SKIPPED, which is what makes the
  at-least-once delivery of foreachBatch exactly-once in effect.  A
  crash *between* the bucket write and the manifest commit is also
  safe: the new version directory is unreferenced until the commit,
  and replace-by-key re-merge is idempotent (update output mode
  delivers full cumulative values, not increments);
- the merge itself is a keyed UPSERT (replace-by-key): the store side
  is pruned to the touched buckets *before* the anti-join, so the
  shuffle is |touched-bucket rows| + |batch rows|, exactly what
  ``MERGE INTO ... WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN
  INSERT`` shuffles on a bucketed lakehouse table.

Scale notes (100 TB): state never lives on the driver — the manifest
is a dict of small integers, and the only ``collect`` is the set of
touched bucket ids (bounded by ``n_buckets``).  The final result is
returned as a lazy scan over the live bucket versions; nothing is
materialized driver-side.  See SCALE.md §"foreachBatch upsert" for
the full 100 TB narrative.
"""

from __future__ import annotations

import atexit
import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bq_nvd_spark.plans.registry import query


class ParquetUpsertStore:
    """Keyed, hash-bucketed parquet store with per-bucket versioned
    commits and batch-id replay dedup (copy-on-write MERGE INTO)."""

    def __init__(
        self,
        root: str,
        n_buckets: int = 8,
        max_history: int = 32,
        vacuum_slack: int | None = None,
    ):
        """``max_history`` bounds snapshot retention: once the manifest
        holds more than this many commits, ``merge_batch`` auto-vacuums
        (a long-lived stream would otherwise grow the manifest and
        superseded bucket-version directories without bound —
        O(batches × n_buckets) disk).

        ``vacuum_slack`` is the hysteresis band: each auto-vacuum trims
        to ``max_history - vacuum_slack`` snapshots, so the next trigger
        is ``vacuum_slack + 1`` batches away and the vacuum's
        full-store directory scan amortizes instead of running on
        EVERY batch once the stream reaches the cap. Retention is
        therefore ``max_history - vacuum_slack ≤ retained ≤
        max_history``; ``read_at`` is only guaranteed for the last
        ``max_history - vacuum_slack`` commits. The DEFAULT is 0 —
        exact-cap retention, vacuum every batch at the cap — so the
        documented ``read_at`` depth of ``max_history`` holds for
        every caller that doesn't opt out; long-lived streams that
        prefer amortized vacuums over the last few snapshots of
        time-travel depth (this package's own streaming upsert/CDC
        queries do) should pass ``max(1, max_history // 4)``."""
        self.root = root
        self.n_buckets = n_buckets
        self.max_history = max(int(max_history), 1)
        if vacuum_slack is None:
            vacuum_slack = 0
        self.vacuum_slack = min(max(int(vacuum_slack), 0),
                                self.max_history - 1)
        # Data-file schema memo (optimization round 17): the merge
        # contract fixes the row schema for the store's lifetime, yet
        # every per-batch touched-bucket read and every current()/
        # read_at() scan re-ran parquet footer inference (~120 ms of
        # driver time each). Captured from the first read; explicit
        # schema reads skip the inference thereafter. Metadata only —
        # the data itself is re-scanned on every action.
        self._data_schema = None
        os.makedirs(root, exist_ok=True)

    def _read(self, spark: SparkSession, paths: list[str]) -> DataFrame:
        """Scan bucket-version dirs with the memoized data schema."""
        if self._data_schema is not None:
            return spark.read.schema(self._data_schema).parquet(*paths)
        df = spark.read.parquet(*paths)
        self._data_schema = df.schema
        return df

    def _manifest(self) -> dict:
        path = os.path.join(self.root, "manifest.json")
        if not os.path.exists(path):
            return {"last_batch_id": -1, "buckets": {}, "history": []}
        with open(path) as fh:
            m = json.load(fh)
        if "buckets" not in m:
            # Pre-bucketed single-version layout ("version" key): its data
            # is invisible to the bucket layout, so refuse loudly rather
            # than silently starting an empty store next to it.
            raise ValueError(
                f"{path} is a legacy single-version store manifest; "
                "migrate it by re-ingesting into a fresh store directory"
            )
        m.setdefault("history", [])
        return m

    def _commit(self, manifest: dict) -> None:
        tmp = os.path.join(self.root, "manifest.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(self.root, "manifest.json"))

    def _bucket_paths(self, buckets: dict, only: set | None = None) -> list[str]:
        return [
            os.path.join(self.root, f"b{k}", f"v{v}")
            for k, v in buckets.items()
            if only is None or int(k) in only
        ]

    def current(self, spark: SparkSession) -> DataFrame | None:
        """Lazy scan over every bucket's live version (no materialization)."""
        m = self._manifest()
        if not m["buckets"]:
            return None
        return self._read(spark, self._bucket_paths(m["buckets"]))

    def read_at(self, spark: SparkSession, batch_id: int) -> DataFrame | None:
        """Snapshot read: the store AS OF the commit for ``batch_id``
        (time travel). Version directories are immutable and commits
        only add new ones, so every snapshot in ``history`` stays
        readable until ``vacuum`` retires it — the same contract a
        lakehouse table's ``VERSION AS OF`` gives. Returns ``None``
        when no RETAINED snapshot covers ``batch_id`` (either the store
        never saw a batch that early, or vacuum trimmed the history
        past it); raises only when a retained snapshot's bucket-version
        directories are missing on disk (a half-deleted snapshot —
        i.e. files were removed behind the manifest's back)."""
        m = self._manifest()
        snap: dict | None = None
        for entry in m["history"]:
            if entry["batch_id"] <= batch_id:
                snap = entry
        if snap is None:
            return None
        paths = self._bucket_paths(snap["buckets"])
        missing = [p for p in paths if not os.path.isdir(p)]
        if missing:
            raise ValueError(
                f"snapshot for batch_id<={batch_id} was vacuumed "
                f"(missing {len(missing)} bucket versions)"
            )
        return self._read(spark, paths) if paths else None

    def vacuum(self, keep_last: int = 1) -> int:
        """Delete bucket-version directories referenced ONLY by commits
        older than the last ``keep_last`` snapshots; returns the number
        of directories removed. The manifest's retained history shrinks
        accordingly, so ``read_at`` fails cleanly (never reads a
        half-deleted snapshot) for retired versions."""
        m = self._manifest()
        keep = m["history"][-max(keep_last, 1):]
        live: set[str] = set()
        for entry in keep:
            live.update(self._bucket_paths(entry["buckets"]))
        live.update(self._bucket_paths(m["buckets"]))
        # Commit the trimmed history BEFORE deleting: vacuum now runs on
        # the streaming hot path (merge_batch auto-vacuum), and a crash
        # between delete and commit would leave "retained" entries
        # pointing at missing directories (read_at would raise on a
        # snapshot the manifest still advertises). Commit-first is
        # crash-safe: a crash after the commit merely leaves orphan
        # version dirs that the directory scan below — being
        # filesystem-driven, not manifest-driven — removes on the next
        # vacuum.
        self._commit({**m, "history": keep})
        removed = 0
        for bucket_dir in sorted(os.listdir(self.root)):
            if not bucket_dir.startswith("b"):
                continue
            bpath = os.path.join(self.root, bucket_dir)
            if not os.path.isdir(bpath):
                continue
            for v in sorted(os.listdir(bpath)):
                vpath = os.path.join(bpath, v)
                if vpath not in live:
                    shutil.rmtree(vpath, ignore_errors=True)
                    removed += 1
        return removed

    def merge_batch(
        self,
        batch_df: DataFrame,
        batch_id: int,
        key: str,
        delete_col: str | None = None,
    ) -> None:
        """Upsert updated keys into the store, exactly once per batch.

        ``batch_df`` carries (key, new cumulative values) for every key
        the batch changed (update output mode), so the merge replaces
        matching keys and inserts new ones — never re-adds.  Only the
        hash buckets containing the batch's keys are rewritten.

        ``delete_col`` names an optional boolean tombstone column (CDC
        feeds carry one): marked rows have their keys REMOVED from the
        store instead of upserted — ``MERGE ... WHEN MATCHED AND
        is_deleted THEN DELETE``.  Tombstoned keys still count as
        touched (their buckets are rewritten without them), and the
        column itself never reaches the stored data."""
        m = self._manifest()
        if batch_id <= m["last_batch_id"]:
            return  # replayed batch after recovery — already applied
        spark = batch_df.sparkSession
        # The merge consumes the batch THREE times (touched-bucket ids,
        # the anti-join key set, the upsert union); without
        # materialization each consumer re-executes the upstream
        # micro-batch plan INCLUDING the stateful aggregation's
        # state-store read — measured at ~0.3 s/batch of pure recompute
        # at sf0.1 (scripts/streaming_floor_profile.py). localCheckpoint
        # (NOT persist: caching a streaming batch plan with a projection
        # over the stateful aggregate trips an attribute-resolution bug
        # in the incremental planner — `key not found: user_id#…` —
        # while the checkpoint's fresh LogicalRDD lineage is immune)
        # materializes the O(|batch keys|) delta once. Release by the
        # checkpointed frame's OWN LogicalRDD id when resolvable —
        # ``batch_df.rdd.unpersist()`` would be a no-op on a fresh
        # javaToPython wrapper, and a bare before/after diff of the
        # context-global persistentRdds map would also capture (and
        # wrongly unpersist) blocks a CONCURRENT query persisted in the
        # window; the id pin scopes the release to this batch's block.
        # The diff remains only as the fallback when the plan shape is
        # not the expected single LogicalRDD.
        from bq_nvd_spark.operators.checkpoint import (
            _persistent_rdd_entries,
            checkpointed_rdd_id,
        )

        sc = spark.sparkContext
        before = {rdd_id for rdd_id, _ in _persistent_rdd_entries(sc)}
        # LAZY checkpoint: the touched-bucket collect below is the first
        # action and materializes it — an eager checkpoint would spend a
        # whole extra job on materialization alone (~one scheduling
        # round-trip per batch on the per-batch floor). The RDD still
        # registers in persistentRdds at call time, so the release
        # bookkeeping is unaffected.
        batch_df = batch_df.localCheckpoint(eager=False)
        target_id = checkpointed_rdd_id(batch_df)
        pinned = [
            (rdd_id, jrdd)
            for rdd_id, jrdd in _persistent_rdd_entries(sc)
            if (rdd_id == target_id)
            or (target_id is None and rdd_id not in before)
        ]
        try:
            self._merge_cached(batch_df, batch_id, key, delete_col, m, spark)
        finally:
            for _, jrdd in pinned:
                jrdd.unpersist(False)

    def _merge_cached(
        self,
        batch_df: DataFrame,
        batch_id: int,
        key: str,
        delete_col: str | None,
        m: dict,
        spark: SparkSession,
    ) -> None:
        bucket_of = F.pmod(F.xxhash64(F.col(key)), F.lit(self.n_buckets)).cast("int")
        upserts = batch_df
        if delete_col is not None:
            # Tombstones: their keys join the anti-join (removing the old
            # rows) but contribute no replacement rows.
            upserts = batch_df.filter(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            ).drop(delete_col)
            batch_df = batch_df.drop(delete_col)
        batch_df = batch_df.withColumn("__bucket", bucket_of)
        upserts = upserts.withColumn("__bucket", bucket_of)
        # The only driver materialization: the touched-bucket id set,
        # bounded by n_buckets regardless of store or delta size.
        touched = {
            r["__bucket"] for r in batch_df.select("__bucket").distinct().collect()
        }
        old_paths = self._bucket_paths(m["buckets"], only=touched)
        if not old_paths:
            combined = upserts
        else:
            # Partition pruning by construction: only touched buckets
            # are scanned, so the anti-join shuffles O(|delta|)-scale
            # rows, never the whole store.
            # partitionBy strips __bucket from data files; recompute it
            # from the key (it is derivable — that is why hash-bucketing
            # needs no stored column).
            old = self._read(spark, old_paths).withColumn("__bucket", bucket_of)
            # Null-safe equality: a NULL merge key (streaming groupBy
            # emits a NULL group when the raw key is NULL) must replace /
            # delete the store's NULL row — plain `on=key` would never
            # match it and NULL rows would duplicate every batch.
            # (xxhash64(NULL) is the seed, not NULL, so NULL keys live in
            # an ordinary bucket and reach this join.)
            keys = batch_df.select(key).alias("__b")
            kept = old.alias("__o").join(
                keys,
                F.col(f"__o.{key}").eqNullSafe(F.col(f"__b.{key}")),
                "left_anti",
            )
            combined = kept.unionByName(upserts)
        new_version = batch_id  # monotonic and unique (replays skipped above)
        (
            combined.repartition("__bucket")
            .write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(os.path.join(self.root, f"delta{new_version}"))
        )
        buckets = dict(m["buckets"])
        delta_root = os.path.join(self.root, f"delta{new_version}")
        for k in touched:
            # Move each written bucket partition under its bucket dir as
            # the next version; the manifest flip below publishes it.
            src = os.path.join(delta_root, f"__bucket={k}")
            dst = os.path.join(self.root, f"b{k}", f"v{new_version}")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if os.path.exists(src):
                # A crash between write and commit leaves an unpublished
                # dst from the same batch id; discard it and re-publish.
                shutil.rmtree(dst, ignore_errors=True)
                os.replace(src, dst)
                buckets[str(k)] = new_version
            else:
                # Tombstones emptied this bucket: no partition dir was
                # written, so retire the bucket from the live map (the
                # old version stays on disk for snapshot reads).
                buckets.pop(str(k), None)
        shutil.rmtree(delta_root, ignore_errors=True)
        history = m["history"] + [{"batch_id": batch_id, "buckets": buckets}]
        self._commit(
            {"last_batch_id": batch_id, "buckets": buckets, "history": history}
        )
        if len(history) > self.max_history:
            # Retention: without this a long-lived stream accumulates
            # one snapshot (manifest entry + superseded bucket version
            # dirs) per batch forever. Runs after the commit so a crash
            # mid-vacuum never loses the batch itself. Trimming BELOW
            # the cap (hysteresis) keeps the vacuum's full-store
            # directory scan off the per-batch hot path: the next
            # trigger is vacuum_slack + 1 batches away, so the O(all
            # bucket-version dirs) walk amortizes to O(dirs / slack)
            # per batch instead of running on every commit at the cap.
            self.vacuum(
                keep_last=max(self.max_history - self.vacuum_slack, 1)
            )


def _staged_event_chunks(spark: SparkSession, sf_dir: str, stage_dir: str, n: int):
    """Split the events table into n parquet chunk directories so the
    file stream (maxFilesPerTrigger=1) delivers the events across n
    micro-batches.  Chunking by ``pmod(event_id, n)`` is deterministic,
    needs no global sort and no driver-side max(), and fills every
    residue class for any realistically dense id fixture; if a residue
    were empty the stream simply delivers fewer batches — the merge
    result is split-independent (integer sums commute).

    Returns the event schema so callers never re-read a chunk directory
    that may not exist (partition columns are stripped from data files,
    so ``ev.schema`` is exactly the streamed schema)."""
    # Raw footer-schema read (NOT load_table: its nanos->timestamp
    # repair would change the staged chunk schema); the schema memo
    # skips the per-invocation footer inference.
    from bq_nvd_spark.sources.tables import table_schema

    path = f"{sf_dir}/events.parquet"
    ev = spark.read.schema(table_schema(spark, path)).parquet(path)
    # One partitioned write emits every chunk directory in a single pass
    # (repartition on the chunk key -> each chunk lands as one file, so
    # maxFilesPerTrigger=1 still yields one micro-batch per chunk).
    (
        ev.withColumn("chunk", F.pmod(F.col("event_id"), F.lit(n)).cast("int"))
        .repartition("chunk")
        .write.mode("overwrite")
        .partitionBy("chunk")
        .parquet(stage_dir)
    )
    return ev.schema


#: process-scoped staged-chunk memo (optimization round 17): the chunk
#: layout is a pure function of (sf_dir, n) — pmod(event_id, n) over an
#: immutable fixture — yet BOTH registered merge streams re-ran the
#: stage write inside every invocation. The stage is read-only once
#: written (each invocation's store/checkpoint stay private and fresh),
#: so one write per process serves every later stream start. Same
#: session-memo class as operators/checkpoint.py::shared_stage; dirs
#: ride the _durable_workdir lifecycle (dead-owner GC + atexit wipe).
_STAGE_BASE: str | None = None
_STAGE_MEMO: dict = {}


def _shared_event_stage(spark: SparkSession, sf_dir: str, n: int):
    """(stage_dir, schema) for the n-chunk staged events table,
    written at most once per (process, sf_dir, n)."""
    global _STAGE_BASE
    if _STAGE_BASE is None:
        _STAGE_BASE = _durable_workdir("stage")
    key = (sf_dir, n)
    hit = _STAGE_MEMO.get(key)
    if hit is not None and os.path.isdir(hit[0]):
        return hit
    # Dir name derived from the KEY (not dict size): a dict-length name
    # collides after the missing-dir recovery path above bumps one
    # entry, and mode("overwrite") would then silently wipe another
    # key's staged chunks.
    import hashlib

    tag = hashlib.md5(repr(key).encode()).hexdigest()[:12]
    d = os.path.join(_STAGE_BASE, f"c{tag}")
    schema = _staged_event_chunks(spark, sf_dir, d, n=n)
    hit = (d, schema)
    _STAGE_MEMO[key] = hit
    return hit


def _proc_start_token(pid: int) -> str | None:
    """The process's kernel start time (clock ticks since boot, field 22
    of /proc/<pid>/stat) — a token that distinguishes two processes
    that reused the same PID.  None when unreadable (no /proc, or the
    process is gone/unreadable)."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as fh:
            stat = fh.read().decode("ascii", "replace")
        # comm can contain spaces/parens; fields are counted after the
        # LAST ')' per proc(5).
        return stat.rsplit(")", 1)[1].split()[19]
    except (OSError, IndexError):
        return None


_CREATED_WORKDIRS: set[str] = set()


def _cleanup_workdirs() -> None:
    for path in _CREATED_WORKDIRS:
        shutil.rmtree(path, ignore_errors=True)


def _durable_workdir(tag: str) -> str:
    """A per-query scratch dir that OUTLIVES the query call, so the
    returned DataFrame stays a lazy scan (the driver collects after we
    return).  The dir is scoped by (pid, process-start-token): a
    concurrent process (driver vs bench, two mirror runs) can never
    wipe a store another session's lazy DataFrame still reads, and a
    REUSED pid cannot masquerade as a live owner (the start token
    differs).  Our own previous run's dir is wiped on entry (the
    consume-before-reinvoke contract: callers consume results before
    re-invoking), dirs left by dead processes are garbage-collected,
    and an atexit hook removes this process's dirs so the final run
    does not leak /tmp space."""
    base = tempfile.gettempdir()
    prefix = f"bq_nvd_{tag}_"
    my_token = _proc_start_token(os.getpid()) or "0"
    for name in os.listdir(base):
        if not name.startswith(prefix):
            continue
        ident = name[len(prefix):]
        pid_s, _, token = ident.partition("_")
        try:
            pid = int(pid_s)
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)  # raises if the owner is gone
            alive = True
        except ProcessLookupError:
            alive = False
        except PermissionError:
            alive = True  # alive under another uid — leave it
        if alive and token:
            # PID exists but may be a different (reused) process: declare
            # the owner dead ONLY on a positive token mismatch. An
            # unreadable token (no /proc, hidepid, other-uid) cannot
            # disprove liveness — keep the dir rather than wiping a
            # store another live session's lazy DataFrame still reads.
            observed = _proc_start_token(pid)
            if observed is not None and observed != token:
                alive = False
        if not alive:
            shutil.rmtree(os.path.join(base, name), ignore_errors=True)
    work = os.path.join(base, f"{prefix}{os.getpid()}_{my_token}")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    if not _CREATED_WORKDIRS:
        atexit.register(_cleanup_workdirs)
    _CREATED_WORKDIRS.add(work)
    return work


def run_upsert_totals_stream(
    spark: SparkSession,
    sf_dir: str,
    work: str,
    n_chunks: int,
    progress: list | None = None,
) -> DataFrame:
    """The upsert-totals pipeline with a parameterizable micro-batch
    count: stage the events into ``n_chunks`` file chunks, stream them
    through a foreachBatch merge sink (one batch per chunk), and return
    the final store's lazy scan. Shared by the registered query (n=4)
    and scripts/streaming_floor.py, which sweeps n to separate the
    streaming engine's fixed per-batch cost from per-row work.

    ``progress``, when passed, receives one StreamingQueryProgress dict
    per micro-batch (the engine's own durationMs decomposition) —
    scripts/streaming_floor_profile.py uses it to attribute the
    per-batch floor to planning / WAL / state / sink."""
    stage, schema = _shared_event_stage(spark, sf_dir, n_chunks)
    store = ParquetUpsertStore(
        os.path.join(work, "store"),
        # long-lived stream: amortize the at-cap vacuum scan, trading
        # the last max_history//4 snapshots of read_at depth
        vacuum_slack=8,
    )

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
        q = (
            partials.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if progress is not None:
            progress.extend(json.loads(p.json) for p in q.recentProgress)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    final = store.current(spark)
    if final is None:  # empty source -> empty store, not a crash
        return spark.createDataFrame([], "user_id long, n_events long, cents bigint")
    return final.select("user_id", "n_events", "cents")


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
    across ~4 micro-batches; the final store must equal the one-shot
    batch aggregate (the oracle) regardless of how events were split.
    Returns the store's lazy scan — no driver-side materialization.

    Consume-before-reinvoke: the returned DataFrame reads this
    process's scratch store, which the NEXT in-process invocation of
    this query wipes — collect the result before re-invoking."""
    work = _durable_workdir("upsert")
    return run_upsert_totals_stream(spark, sf_dir, work, n_chunks=4)


@query(
    "streaming_cdc_user_totals",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
    FROM events
    GROUP BY user_id
    HAVING arg_max(event_type, event_id) <> 'error'
    """,
)
def streaming_cdc_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge: per-user totals where a user whose LATEST event (by
    event_id) is an ``error`` is tombstoned out of the store — ``MERGE
    ... WHEN MATCHED AND is_deleted THEN DELETE``.

    The tombstone verdict is a cumulative streaming aggregate
    (``max_by(event_type, event_id)``), so each micro-batch re-emits a
    changed user with their CURRENT verdict: a user deleted in batch 2
    reappears in batch 3 when a newer non-error event arrives.  That
    makes the final store split-independent — it must equal the batch
    oracle for ANY chunking of the events — which is exactly the
    replay-safe CDC contract.  Same bucketed copy-on-write store as
    ``streaming_upsert_user_totals``; deletes rewrite only the buckets
    the tombstoned keys hash into.

    Consume-before-reinvoke: the returned DataFrame reads this
    process's scratch store, which the NEXT in-process invocation of
    this query wipes — collect the result before re-invoking."""
    work = _durable_workdir("cdc")
    stage, schema = _shared_event_stage(spark, sf_dir, 4)
    store = ParquetUpsertStore(
        os.path.join(work, "store"),
        # long-lived stream: amortize the at-cap vacuum scan, trading
        # the last max_history//4 snapshots of read_at depth
        vacuum_slack=8,
    )

    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(stage, "chunk=*"))
    )
    partials = (
        raw.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
            ).alias("cents"),
            F.max_by("event_type", "event_id").alias("last_type"),
        )
        .select(
            "user_id",
            "n_events",
            "cents",
            (F.col("last_type") == "error").alias("is_deleted"),
        )
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        store.merge_batch(
            batch_df, batch_id, key="user_id", delete_col="is_deleted"
        )

    ckpt = os.path.join(work, "ckpt")
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
    final = store.current(spark)
    if final is None:  # every user tombstoned -> empty result, not a crash
        return spark.createDataFrame([], "user_id long, n_events long, cents bigint")
    return final.select("user_id", "n_events", "cents")
