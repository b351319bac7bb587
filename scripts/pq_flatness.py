"""Instrumented repeat-measure for pq_adc_recall_topk (round-9 task 6).

The r8 driver bench recorded samples [16.1, 7.6, 13.6] for this query,
contradicting r7's warm-up-then-flat claim [7.1, 5.7, 4.9]. Both runs
executed bit-identical code, so the question is whether the instability
is (a) a real leak — pinned checkpoint blocks surviving the per-run
release and taxing later runs — or (b) environment noise from the
driver's concurrent load. This script measures N repeats under NO
concurrent load and records, per run:

- wall seconds,
- persistent-RDD count BEFORE the pre-run release and AFTER it
  (a leak shows as a before-count that grows run over run),
- storage memory in use across the block manager after the run
  (pinned localCheckpoint bytes show here),
- the released-RDD count of the pre-run release.

Usage: python scripts/pq_flatness.py [--sf DIR] [--repeats N]
Prints one JSON line; paste the result into SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def storage_used_bytes(sc) -> int:
    """Sum of (memSize + diskSize) over currently-persisted RDDs —
    pinned localCheckpoint blocks show up here."""
    total = 0
    for info in sc._jsc.sc().getRDDStorageInfo():
        total += info.memSize() + info.diskSize()
    return total


def persistent_rdd_count(sc) -> int:
    it = sc._jsc.sc().getPersistentRDDs().iterator()
    n = 0
    while it.hasNext():
        it.next()
        n += 1
    return n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    sc = spark.sparkContext
    from bq_nvd_spark.operators.checkpoint import release_stage_checkpoints
    from bq_nvd_spark.plans import QUERIES

    # session warm-up (codegen + Arrow spin-up on an unrelated plan)
    spark.range(10000).selectExpr("sum(id)").collect()

    runs = []
    for i in range(args.repeats):
        before_rdds = persistent_rdd_count(sc)
        released = release_stage_checkpoints(spark)
        after_rdds = persistent_rdd_count(sc)
        sc._jvm.System.gc()
        t0 = time.perf_counter()
        n = QUERIES["pq_adc_recall_topk"](spark, args.sf).count()
        wall = time.perf_counter() - t0
        runs.append(
            {
                "wall_s": round(wall, 2),
                "rows": n,
                "rdds_before_release": before_rdds,
                "rdds_after_release": after_rdds,
                "released": released,
                "storage_bytes_after_run": storage_used_bytes(sc),
            }
        )
        print(f"# run {i}: {runs[-1]}", file=sys.stderr)
    walls = sorted(r["wall_s"] for r in runs)
    print(
        json.dumps(
            {
                "query": "pq_adc_recall_topk",
                "sf_dir": args.sf,
                "cpus": args.cpus,
                "runs": runs,
                "median_wall_s": walls[(len(walls) - 1) // 2],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
