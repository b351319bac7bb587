"""Golden-file tests for the Layer-A NVD ingest pipeline (SURVEY.md §5):
schema port fidelity, first-write-wins dedup, empty-delta no-op, the
bootstrap/incremental switch, and the NDJSON sink roundtrip.
"""

from __future__ import annotations

import gzip
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from bq_nvd_spark.nvd import (
    NvdStore,
    cve_items,
    ingest_feed,
    nvd_schema,
    parse_bq_json_schema,
    read_cve_ndjson,
    read_feed,
    run,
    write_ndjson,
)
from bq_nvd_spark.nvd.etl import ID_COL

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "nvd")
YEAR_FEED = os.path.join(FIXTURES, "nvdcve-1.1-2024.json.gz")
RECENT_FEED = os.path.join(FIXTURES, "nvdcve-1.1-recent.json.gz")


# --------------------------------------------------------------------------
# S7: schema loader semantics (reference bq_nvd/bq.py:24-82)
def test_schema_loader_defaults():
    """No ``type`` → STRING, no ``mode`` → NULLABLE (bq.py:51-52);
    RECORD → struct, REPEATED → array."""
    doc = [
        {"name": "plain"},  # both defaults
        {"name": "score", "type": "FLOAT"},
        {"name": "when", "type": "TIMESTAMP"},
        {"name": "tags", "mode": "REPEATED"},  # repeated string
        {
            "name": "rec",
            "type": "RECORD",
            "mode": "REPEATED",
            "fields": [{"name": "inner"}],
        },
    ]
    st = parse_bq_json_schema(doc)
    assert st == StructType(
        [
            StructField("plain", StringType(), True),
            StructField("score", DoubleType(), True),
            StructField("when", TimestampType(), True),
            StructField("tags", ArrayType(StringType(), True), True),
            StructField(
                "rec",
                ArrayType(StructType([StructField("inner", StringType(), True)]), True),
                True,
            ),
        ]
    )


def test_nvd_schema_shape():
    """The ported schema exposes the reference's full 4-deep field tree."""
    st = nvd_schema()
    names = set(st.fieldNames())
    assert names == {"lastModifiedDate", "impact", "configurations", "publishedDate", "cve"}
    # 4 deep: configurations.nodes[].children[].cpe_match[].cpe23Uri
    nodes = st["configurations"].dataType["nodes"].dataType.elementType
    cpe = nodes["children"].dataType.elementType["cpe_match"].dataType.elementType
    assert cpe["cpe23Uri"].dataType == StringType()
    assert st["publishedDate"].dataType == TimestampType()


# --------------------------------------------------------------------------
# S2/P1/P3: explicit-schema gz read — lenient ingest drops unknown keys
def test_feed_read_drops_unknown_keys(spark):
    items = cve_items(read_feed(spark, YEAR_FEED))
    assert items.schema == nvd_schema()
    # the fixture's items all carry sourceIdentifier/vendorComments —
    # projection-to-schema must have discarded them silently
    assert "sourceIdentifier" not in items.columns
    assert items.count() == 8


def test_feed_read_null_vs_empty_arrays(spark):
    """Missing configurations → NULL struct; empty nodes list → []."""
    items = cve_items(read_feed(spark, YEAR_FEED))
    by_id = {
        r["ID"]: r
        for r in items.select(
            F.col(ID_COL).alias("ID"),
            F.col("configurations").isNull().alias("conf_null"),
            F.size("configurations.nodes").alias("n_nodes"),
        ).collect()
    }
    assert by_id["CVE-2024-0005"]["conf_null"] is True
    assert by_id["CVE-2024-0004"]["n_nodes"] == 1  # node present, empty cpe_match
    assert by_id["CVE-2024-0001"]["n_nodes"] == 1


# --------------------------------------------------------------------------
# J1/A3/T2: store semantics through the full pipeline
def test_bootstrap_then_incremental_first_write_wins(spark, tmp_path):
    store = NvdStore(spark, str(tmp_path / "nvd_store"))

    # Greenfield: count triggers create (S6) and reports 0 (bq.py:137-140)
    assert store.count_cves() == 0

    # Bootstrap (count < threshold) loads the year feed
    results = run(spark, store, [YEAR_FEED], RECENT_FEED, bootstrap_threshold=5)
    assert [r.loaded for r in results] == [8]
    assert store.count_cves() == 8

    # Brownfield now (8 >= 5): incremental loads only the 2 genuinely-new
    results = run(spark, store, [YEAR_FEED], RECENT_FEED, bootstrap_threshold=5)
    assert [(r.loaded, r.skipped) for r in results] == [(2, False)]
    assert store.count_cves() == 10

    # First-write-wins: the re-published CVE-2024-0002 kept its ORIGINAL
    # lastModifiedDate (existing rows win, reference etl.py:87-88)
    kept = (
        store.read()
        .filter(F.col(ID_COL) == "CVE-2024-0002")
        .select("lastModifiedDate")
        .collect()
    )
    assert len(kept) == 1
    assert kept[0][0].isoformat() == "2024-01-06T09:00:00"

    # Idempotent re-run: empty delta short-circuits, no write (etl.py:94-96)
    results = run(spark, store, [YEAR_FEED], RECENT_FEED, bootstrap_threshold=5)
    assert [(r.loaded, r.skipped) for r in results] == [(0, True)]
    assert store.count_cves() == 10


def test_store_partitioned_by_year(spark, tmp_path):
    store = NvdStore(spark, str(tmp_path / "store"))
    ingest_feed(spark, store, YEAR_FEED)
    years = {n for n in os.listdir(store.path) if n.startswith("_pub_year=")}
    assert years == {"_pub_year=2024"}


# --------------------------------------------------------------------------
# S3: NDJSON staging sink roundtrip (reference etl.py:98-116)
def test_ndjson_sink_roundtrip(spark, tmp_path):
    items = cve_items(read_feed(spark, YEAR_FEED))
    out = str(tmp_path / "staged")
    write_ndjson(items, out)

    # one compact JSON object per line
    part_files = [
        os.path.join(out, n) for n in os.listdir(out) if n.startswith("part-")
    ]
    lines = []
    for p in part_files:
        with open(p) as f:
            lines.extend(line for line in f.read().splitlines() if line)
    assert len(lines) == 8
    assert all(json.loads(line)["cve"]["CVE_data_meta"]["ID"] for line in lines)

    # and the roundtrip preserves rows
    back = read_cve_ndjson(spark, out)
    assert back.schema == nvd_schema()
    orig_ids = {r[0] for r in items.select(ID_COL).collect()}
    back_ids = {r[0] for r in back.select(ID_COL).collect()}
    assert back_ids == orig_ids


# --------------------------------------------------------------------------
# within-batch dedup determinism
def test_dedup_within_batch(spark, tmp_path):
    """A feed carrying the same ID twice loads exactly one row."""
    feed = json.loads(gzip.open(YEAR_FEED).read())
    feed["CVE_Items"].append(dict(feed["CVE_Items"][0]))  # duplicate ID
    dup_path = str(tmp_path / "dup.json.gz")
    with gzip.open(dup_path, "wt") as f:
        json.dump(feed, f)

    store = NvdStore(spark, str(tmp_path / "store"))
    result = ingest_feed(spark, store, dup_path)
    assert result.loaded == 8
    ids = [r[0] for r in store.read().select(ID_COL).collect()]
    assert len(ids) == len(set(ids)) == 8


# --------------------------------------------------------------------------
# S1: feed acquisition (driver-side fetch; file:// stands in for HTTPS)
def test_download_feed_from_file_url(spark, tmp_path):
    from bq_nvd_spark.nvd import download_feeds, feed_names, feed_url

    fixture_dir = os.path.dirname(YEAR_FEED)
    base = f"file://{fixture_dir}/"
    landing = str(tmp_path / "landing")
    paths = download_feeds(["2024", "recent"], landing, url_base=base)
    assert all(os.path.exists(p) for p in paths)

    # the landing dir is directly scannable as a distributed feed read
    feed = read_feed(spark, landing)
    assert cve_items(feed).count() > 0

    assert feed_url("recent").endswith("nvdcve-1.1-recent.json.gz")
    names = feed_names(2004)
    assert names == ["2002", "2003", "2004", "recent", "modified"]


def test_download_feed_retries_then_fails(tmp_path):
    from bq_nvd_spark.nvd import download_feed

    with pytest.raises(RuntimeError, match="after 3 tries"):
        download_feed(
            "2024", str(tmp_path / "landing"), url_base=f"file://{tmp_path}/missing/"
        )


# --------------------------------------------------------------------------
# store partition pruning: a _pub_year filter must reach the scan as a
# partition filter, not a post-scan predicate
def test_store_partition_pruning(spark, tmp_path):
    store = NvdStore(spark, str(tmp_path / "store"))
    ingest_feed(spark, store, YEAR_FEED)

    pruned = store.read().filter(F.col("_pub_year") == 2024)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "_pub_year" in plan.split("PartitionFilters")[1].split("]")[0]
    assert pruned.count() > 0
    assert store.read().filter(F.col("_pub_year") == 1999).count() == 0


# --------------------------------------------------------------------------
# malformed-feed policy: PERMISSIVE audit vs reference-parity FAILFAST
def test_corrupt_feed_audit_and_failfast(spark, tmp_path):
    import gzip as _gzip

    bad = str(tmp_path / "bad.json.gz")
    with _gzip.open(bad, "wt") as f:
        f.write('{"CVE_Items": [ {"cve": TRUNCATED')

    # default PERMISSIVE: the batch survives, the bad document nulls out
    assert read_feed(spark, bad).count() == 1
    assert cve_items(read_feed(spark, bad)).count() == 0

    # audit column carries the raw unparseable bytes
    audited = read_feed(spark, bad, corrupt_col="_corrupt").collect()
    assert len(audited) == 1
    assert audited[0]["_corrupt"] is not None
    assert "TRUNCATED" in audited[0]["_corrupt"]

    # a good feed leaves the audit column null (collect the full rows —
    # Spark refuses a query that references ONLY the corrupt column)
    ok_rows = read_feed(spark, YEAR_FEED, corrupt_col="_corrupt").collect()
    assert ok_rows and all(r["_corrupt"] is None for r in ok_rows)

    # FAILFAST mirrors the reference's abort-on-bad-JSON
    with pytest.raises(Exception, match="FAILFAST|Malformed|malformed"):
        read_feed(spark, bad, mode="FAILFAST").count()


# --------------------------------------------------------------------------
# Scale rehearsal: a synthetic multi-year backfill (~100k CVEs, the size
# of the real NVD corpus) through bootstrap → incremental →
# first-write-wins, plus an explain-plan assertion that year-scoped
# reads actually PRUNE the per-year partitions (the store's entire
# reason for partitioning by year(publishedDate)).
def _synth_feed_gz(path: str, year: int, n: int, start: int = 0) -> list[str]:
    """Write a minimal-but-schema-valid year feed of n CVEs; returns IDs."""
    ids = [f"CVE-{year}-{start + i:05d}" for i in range(n)]
    items = [
        {
            "cve": {
                "CVE_data_meta": {"ID": cve_id, "ASSIGNER": "synth@example"},
                "description": {
                    "description_data": [
                        {"lang": "en", "value": f"synthetic entry {cve_id}"}
                    ]
                },
            },
            "publishedDate": f"{year}-{(i % 12) + 1:02d}-{(i % 27) + 1:02d}"
            f"T{(i % 24):02d}:00Z",
            "lastModifiedDate": f"{year}-12-31T00:00Z",
        }
        for i, cve_id in enumerate(ids)
    ]
    with gzip.open(path, "wt") as fh:
        json.dump({"CVE_data_format": "MITRE", "CVE_Items": items}, fh)
    return ids


def test_backfill_100k_bootstrap_incremental_and_partition_pruning(
    spark, tmp_path
):
    years = {2018: 24_000, 2019: 26_000, 2020: 25_000, 2021: 25_000}
    feeds = []
    for year, n in years.items():
        p = str(tmp_path / f"nvdcve-1.1-{year}.json.gz")
        _synth_feed_gz(p, year, n)
        feeds.append(p)
    # recent: 500 re-publications of 2021 entries (must lose, first write
    # wins) + 500 genuinely new 2021 entries (must load)
    recent = str(tmp_path / "nvdcve-1.1-recent.json.gz")
    overlap_ids = [f"CVE-2021-{i:05d}" for i in range(500)]
    new_ids = [f"CVE-2021-{25_000 + i:05d}" for i in range(500)]
    combined = []
    for i, cve_id in enumerate(overlap_ids + new_ids):
        combined.append(
            {
                "cve": {
                    "CVE_data_meta": {"ID": cve_id, "ASSIGNER": "synth@example"},
                    "description": {
                        "description_data": [
                            {"lang": "en", "value": f"republished {cve_id}"}
                        ]
                    },
                },
                "publishedDate": f"2021-{(i % 12) + 1:02d}-01T00:00Z",
                "lastModifiedDate": "2022-06-01T00:00Z",
            }
        )
    with gzip.open(recent, "wt") as fh:
        json.dump({"CVE_data_format": "MITRE", "CVE_Items": combined}, fh)

    store = NvdStore(spark, str(tmp_path / "store"))
    total = sum(years.values())

    # Bootstrap: greenfield (< threshold) loads every year feed fully
    results = run(spark, store, feeds, recent, bootstrap_threshold=1000)
    assert [r.loaded for r in results] == list(years.values())
    assert store.count_cves() == total

    # Brownfield: incremental loads ONLY the 500 genuinely-new entries
    results = run(spark, store, feeds, recent, bootstrap_threshold=1000)
    assert [(r.loaded, r.skipped) for r in results] == [(500, False)]
    assert store.count_cves() == total + 500

    # First-write-wins: a re-published entry kept its ORIGINAL
    # lastModifiedDate (2021-12-31, not the recent feed's 2022-06-01)
    kept = (
        store.read()
        .filter(F.col(ID_COL) == "CVE-2021-00003")
        .select("lastModifiedDate")
        .collect()
    )
    assert len(kept) == 1
    assert kept[0][0].year == 2021

    # Partition pruning: a year-scoped read pushes a PartitionFilters
    # entry on _pub_year and the executed scan reads ONE partition of
    # the five on disk (the scan leaf's numPartitions metric counts
    # partitions actually read after pruning)
    scoped = store.read().filter(F.col("_pub_year") == 2019).select(ID_COL)
    rows = scoped.collect()
    assert len(rows) == years[2019]
    plan = scoped._jdf.queryExecution().executedPlan()
    assert "PartitionFilters" in plan.toString() and "_pub_year" in (
        plan.toString().split("PartitionFilters")[1][:200]
    ), plan.toString()[:2000]
    scan = plan.collectLeaves().apply(0)
    assert scan.metrics().apply("numPartitions").value() == 1

    # on-disk layout: one directory per year (+ the ensure()-time marker)
    dirs = {n for n in os.listdir(store.path) if n.startswith("_pub_year=")}
    assert {f"_pub_year={y}" for y in years} <= dirs
