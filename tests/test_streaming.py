"""Batch-equivalence of the Structured Streaming plans.

The oracle-parity suite already hash-checks the streaming queries against
DuckDB; these tests additionally pin the *streaming vs batch* contract —
an AvailableNow drain of the file stream must produce exactly the batch
plan's result — and that the stream really runs through the streaming
engine (isStreaming, bounded trigger)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bq_nvd_spark.sources.tables import load_table
from bq_nvd_spark.streaming import (
    run_available_now,
    stream_events,
    streaming_dedup_keys,
    streaming_tumbling_counts,
)


def _as_set(df):
    return {tuple(map(repr, row)) for row in df.collect()}


def test_stream_events_is_streaming(spark, sf_dir):
    ev = stream_events(spark, sf_dir)
    assert ev.isStreaming
    # always TIMESTAMP (LTZ), whichever way the parquet ships it
    # (NANOS-as-long → micros repair; MICROS/NTZ → cast): watermarks
    # reject TIMESTAMP_NTZ event-time columns outright
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    streamed = streaming_tumbling_counts(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    assert _as_set(streamed) == _as_set(batch)


def test_streaming_dedup_equals_batch_distinct(spark, sf_dir):
    streamed = streaming_dedup_keys(spark, sf_dir)
    batch = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type"
    ).distinct()
    assert _as_set(streamed) == _as_set(batch)


def test_available_now_rerun_is_stable(spark, sf_dir):
    """Two activations over the same files agree (fresh checkpoints)."""
    first = run_available_now(
        stream_events(spark, sf_dir).select("user_id", "event_type").dropDuplicates(
            ["user_id", "event_type"]
        ),
        output_mode="append",
        name_prefix="stability",
    )
    second = streaming_dedup_keys(spark, sf_dir)
    assert _as_set(first) == _as_set(second)


def test_stream_cve_ingest_first_write_wins(spark, tmp_path):
    """The NVD loop in streaming form: NDJSON staging dir → dropDuplicates
    state on CVE ID → AvailableNow drain equals the batch dedup."""
    import json

    from bq_nvd_spark.nvd import cve_items, read_feed, write_ndjson
    from bq_nvd_spark.nvd.etl import ID_COL
    from bq_nvd_spark.streaming import stream_cve_ingest

    fixture = "tests/fixtures/nvd/nvdcve-1.1-2024.json.gz"
    staging = str(tmp_path / "staging")
    items = cve_items(read_feed(spark, fixture))
    write_ndjson(items, staging)

    stream = stream_cve_ingest(spark, staging)
    assert stream.isStreaming
    got = run_available_now(
        stream.select("ID"),
        output_mode="append",
        name_prefix="cve_ingest",
        state_partitions=4,
    )
    got_ids = {r.ID for r in got.collect()}
    want_ids = {r[0] for r in items.select(ID_COL).collect()}
    assert got_ids == want_ids


def test_upsert_store_replay_and_merge(spark, tmp_path):
    """ParquetUpsertStore: replace-by-key merge, and a replayed batch id
    (post-recovery at-least-once delivery) is skipped without touching
    the store."""
    from bq_nvd_spark.streaming.foreach_sink import ParquetUpsertStore

    store = ParquetUpsertStore(str(tmp_path / "store"))
    b0 = spark.createDataFrame(
        [(1, 2, 100), (2, 1, 50)], "user_id long, n_events long, cents long"
    )
    store.merge_batch(b0, batch_id=0, key="user_id")
    # batch 1 updates key 1 (new cumulative), inserts key 3
    b1 = spark.createDataFrame(
        [(1, 5, 300), (3, 1, 10)], "user_id long, n_events long, cents long"
    )
    store.merge_batch(b1, batch_id=1, key="user_id")
    got = {r["user_id"]: (r["n_events"], r["cents"]) for r in store.current(spark).collect()}
    assert got == {1: (5, 300), 2: (1, 50), 3: (1, 10)}
    # replay batch 1 with stale values — must be a no-op
    stale = spark.createDataFrame(
        [(1, 99, 999)], "user_id long, n_events long, cents long"
    )
    store.merge_batch(stale, batch_id=1, key="user_id")
    again = {r["user_id"]: (r["n_events"], r["cents"]) for r in store.current(spark).collect()}
    assert again == got


def test_staged_event_chunks_sparse_ids(spark, tmp_path):
    """Staging must not assume event_ids are dense from zero: a fixture
    whose minimum id is far above the chunk step used to crash the
    schema re-read of chunk=0 (the chunk layout may skip residues, and
    the streamed schema now comes from the source DataFrame, never from
    re-reading a chunk directory)."""
    import datetime

    from bq_nvd_spark.streaming.foreach_sink import _staged_event_chunks

    sf_dir = str(tmp_path / "sf")
    stage = str(tmp_path / "stage")
    ev = spark.createDataFrame(
        [
            (1_000_003, datetime.datetime(2024, 1, 1), 1, "view", 1.0, "{}"),
            (1_000_007, datetime.datetime(2024, 1, 2), 2, "click", 2.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import os as _os

    _os.makedirs(sf_dir, exist_ok=True)
    ev.write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    schema = _staged_event_chunks(spark, sf_dir, stage, n=4)
    assert "event_id" in schema.fieldNames() and "chunk" not in schema.fieldNames()
    back = (
        spark.read.schema(schema).parquet(f"{stage}/chunk=*").select("event_id")
    )
    assert {r.event_id for r in back.collect()} == {1_000_003, 1_000_007}


def test_upsert_store_rewrites_only_touched_buckets(spark, tmp_path):
    """Copy-on-write contract: a batch touching one key must republish
    only that key's hash bucket — every other bucket keeps its version
    (rewrite bytes scale with the delta, not the store)."""
    import json

    from bq_nvd_spark.streaming.foreach_sink import ParquetUpsertStore

    store = ParquetUpsertStore(str(tmp_path / "store"), n_buckets=8)
    seed = spark.createDataFrame(
        [(i, 1, i * 10) for i in range(40)],
        "user_id long, n_events long, cents long",
    )
    store.merge_batch(seed, batch_id=0, key="user_id")
    before = json.load(open(tmp_path / "store" / "manifest.json"))["buckets"]
    assert len(before) > 1  # 40 uniform keys spread over several buckets

    one = spark.createDataFrame([(7, 5, 999)], "user_id long, n_events long, cents long")
    store.merge_batch(one, batch_id=1, key="user_id")
    after = json.load(open(tmp_path / "store" / "manifest.json"))["buckets"]
    changed = [k for k in after if after[k] != before.get(k)]
    assert len(changed) == 1  # exactly the bucket user 7 hashes into
    got = {r["user_id"]: (r["n_events"], r["cents"]) for r in store.current(spark).collect()}
    assert got[7] == (5, 999) and len(got) == 40


def test_upsert_store_cdc_deletes(spark, tmp_path):
    """CDC merge: a tombstoned key is removed from the store (MERGE ...
    WHEN MATCHED THEN DELETE), the tombstone column never reaches the
    stored data, a delete that empties a whole bucket retires it from
    the live map, and replaying the delete batch stays a no-op."""
    from bq_nvd_spark.streaming.foreach_sink import ParquetUpsertStore

    store = ParquetUpsertStore(str(tmp_path / "store"), n_buckets=2)
    seed = spark.createDataFrame(
        [(i, 1, i * 10) for i in range(8)],
        "user_id long, n_events long, cents long",
    )
    store.merge_batch(seed, batch_id=0, key="user_id")

    # batch 1: update key 1, delete key 2, insert key 9
    b1 = spark.createDataFrame(
        [(1, 4, 111, False), (2, 0, 0, True), (9, 1, 90, False)],
        "user_id long, n_events long, cents long, is_deleted boolean",
    )
    store.merge_batch(b1, batch_id=1, key="user_id", delete_col="is_deleted")
    cur = store.current(spark)
    assert "is_deleted" not in cur.columns
    got = {r["user_id"]: r["cents"] for r in cur.collect()}
    assert 2 not in got and got[1] == 111 and got[9] == 90 and len(got) == 8

    # batch 2: delete EVERYTHING (empties both buckets)
    b2 = spark.createDataFrame(
        [(u, 0, 0, True) for u in got],
        "user_id long, n_events long, cents long, is_deleted boolean",
    )
    store.merge_batch(b2, batch_id=2, key="user_id", delete_col="is_deleted")
    assert store.current(spark) is None  # live map fully retired
    # snapshot of batch 1 still readable (versions are immutable)
    snap = {r["user_id"]: r["cents"] for r in store.read_at(spark, 1).collect()}
    assert snap == got

    # replaying the delete batch is a no-op
    store.merge_batch(b2, batch_id=2, key="user_id", delete_col="is_deleted")
    assert store.current(spark) is None


def test_upsert_store_null_key_replaces_and_deletes(spark, tmp_path):
    """A NULL merge key (a streaming groupBy emits a NULL group when the
    raw key is NULL) must behave like any other key: replaced on upsert
    (never duplicated across batches — requires null-safe join equality)
    and removable by a tombstone."""
    from bq_nvd_spark.streaming.foreach_sink import ParquetUpsertStore

    store = ParquetUpsertStore(str(tmp_path / "store"), n_buckets=4)
    b0 = spark.createDataFrame(
        [(None, 1, 10), (1, 1, 100)], "user_id long, n_events long, cents long"
    )
    store.merge_batch(b0, batch_id=0, key="user_id")
    b1 = spark.createDataFrame(
        [(None, 3, 30)], "user_id long, n_events long, cents long"
    )
    store.merge_batch(b1, batch_id=1, key="user_id")
    rows = store.current(spark).collect()
    got = {r["user_id"]: r["cents"] for r in rows}
    assert got == {None: 30, 1: 100} and len(rows) == 2  # replaced, not duplicated

    b2 = spark.createDataFrame(
        [(None, 0, 0, True)],
        "user_id long, n_events long, cents long, is_deleted boolean",
    )
    store.merge_batch(b2, batch_id=2, key="user_id", delete_col="is_deleted")
    assert {r["user_id"] for r in store.current(spark).collect()} == {1}


def test_upsert_store_rejects_legacy_manifest(spark, tmp_path):
    import json

    import pytest

    from bq_nvd_spark.streaming.foreach_sink import ParquetUpsertStore

    root = tmp_path / "store"
    root.mkdir()
    (root / "manifest.json").write_text(
        json.dumps({"version": 3, "last_batch_id": 2})
    )
    store = ParquetUpsertStore(str(root))
    with pytest.raises(ValueError, match="legacy"):
        store.current(spark)


def test_upsert_store_time_travel_and_vacuum(spark, tmp_path):
    """Snapshot reads: read_at(batch) sees the store as of that commit
    (version dirs are immutable), and vacuum retires old snapshots while
    keeping the live view intact — retired reads fail cleanly."""
    from bq_nvd_spark.streaming.foreach_sink import ParquetUpsertStore

    store = ParquetUpsertStore(str(tmp_path / "store"), n_buckets=4)
    b0 = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 20)], "user_id long, n_events long, cents long"
    )
    store.merge_batch(b0, batch_id=0, key="user_id")
    b1 = spark.createDataFrame(
        [(1, 3, 99), (5, 1, 50)], "user_id long, n_events long, cents long"
    )
    store.merge_batch(b1, batch_id=1, key="user_id")

    at0 = {r["user_id"]: r["cents"] for r in store.read_at(spark, 0).collect()}
    assert at0 == {1: 10, 2: 20}  # pre-update snapshot
    at1 = {r["user_id"]: r["cents"] for r in store.read_at(spark, 1).collect()}
    assert at1 == {1: 99, 2: 20, 5: 50}
    assert store.read_at(spark, -1) is None  # before any commit

    removed = store.vacuum(keep_last=1)
    assert removed >= 1  # batch-0's superseded bucket version retired
    # live view unaffected; the retired snapshot is gone from history so
    # read_at resolves to no-snapshot rather than a half-deleted scan
    live = {r["user_id"]: r["cents"] for r in store.current(spark).collect()}
    assert live == at1
    assert store.read_at(spark, 0) is None
    still = {r["user_id"]: r["cents"] for r in store.read_at(spark, 1).collect()}
    assert still == at1


def test_auto_vacuum_hysteresis_amortizes_scans(spark, tmp_path):
    """At the retention cap, vacuum must NOT run on every batch: with
    slack s, each auto-vacuum trims to max_history - s, so over
    2×max_history steady-state batches the full-store scan fires about
    once per s+1 commits, while retention stays inside the documented
    [max_history - s, max_history] band."""
    from bq_nvd_spark.streaming.foreach_sink import ParquetUpsertStore

    store = ParquetUpsertStore(
        str(tmp_path / "store"), n_buckets=2, max_history=8, vacuum_slack=3
    )
    calls = []
    inner = store.vacuum
    store.vacuum = lambda keep_last=1: calls.append(keep_last) or inner(
        keep_last
    )
    n = 2 * store.max_history
    for bid in range(n):
        df = spark.createDataFrame(
            [(bid % 3, bid)], "user_id long, cents long"
        )
        store.merge_batch(df, batch_id=bid, key="user_id")
        assert len(store._manifest()["history"]) <= store.max_history + 1
    # triggers at history lengths 9, then every slack+1 = 4 batches:
    # 16 batches -> first trigger at batch 8, then 12 (len 9 again) ...
    expected = (n - store.max_history - 1) // (store.vacuum_slack + 1) + 1
    assert len(calls) == expected
    assert all(k == store.max_history - store.vacuum_slack for k in calls)
    retained = len(store._manifest()["history"])
    assert store.max_history - store.vacuum_slack <= retained <= store.max_history
    # live view correct after all the churn
    got = {r["user_id"]: r["cents"] for r in store.current(spark).collect()}
    assert got == {0: 15, 1: 13, 2: 14}


def test_vacuum_slack_zero_restores_exact_cap(spark, tmp_path):
    from bq_nvd_spark.streaming.foreach_sink import ParquetUpsertStore

    store = ParquetUpsertStore(
        str(tmp_path / "store"), n_buckets=2, max_history=2, vacuum_slack=0
    )
    for bid in range(5):
        df = spark.createDataFrame([(0, bid)], "user_id long, cents long")
        store.merge_batch(df, batch_id=bid, key="user_id")
        assert len(store._manifest()["history"]) <= 2


def test_merge_batch_releases_checkpoint_blocks(spark, tmp_path):
    """merge_batch materializes the batch delta via localCheckpoint; the
    blocks must actually be RELEASED at commit (DataFrame.rdd.unpersist
    would be a no-op on a fresh javaToPython wrapper — the fix diffs
    the context's persistentRdds map), or a long-lived stream leaks one
    checkpoint block per batch."""
    from bq_nvd_spark.operators.checkpoint import _persistent_rdd_entries
    from bq_nvd_spark.streaming.foreach_sink import ParquetUpsertStore

    sc = spark.sparkContext
    store = ParquetUpsertStore(str(tmp_path / "store"), n_buckets=2)
    before = {rdd_id for rdd_id, _ in _persistent_rdd_entries(sc)}
    for bid in range(3):
        df = spark.createDataFrame(
            [(1, 10 + bid), (2, 20 + bid)], "user_id long, v long"
        )
        store.merge_batch(df, bid, key="user_id")
    after = {rdd_id for rdd_id, _ in _persistent_rdd_entries(sc)}
    assert after - before == set(), (
        f"leaked checkpoint blocks: {sorted(after - before)}"
    )
    got = {
        r["user_id"]: r["v"] for r in store.current(spark).collect()
    }
    assert got == {1: 12, 2: 22}
