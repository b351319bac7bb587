"""Measure the streaming engine's fixed per-micro-batch cost floor.

SCALE.md's foreachBatch-upsert section claims merge cost ~ O(|delta|);
on local[32] at sf0.1 the registered query spends ~1.3 s per
micro-batch, and this harness separates that into (a) the engine's
fixed per-batch overhead (trigger planning, state snapshot, sink
commit) and (b) per-row work, by running the SAME total data through
n = 1, 2, 4, 8 micro-batches. Total rows are constant, so if cost were
per-row the wall time would be flat in n; the measured slope IS the
per-batch floor.

Prints one JSON line: per-n wall times (median of --repeats), the
fitted per-batch floor (least-squares slope over n), and the implied
per-row residual.

Usage: python scripts/streaming_floor.py [--sf DIR] [--repeats R]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def median(xs: list[float]) -> float:
    return sorted(xs)[(len(xs) - 1) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--chunks", default="1,2,4,8")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("streaming-floor")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from bq_nvd_spark.session import tune_session
    from bq_nvd_spark.streaming.foreach_sink import run_upsert_totals_stream

    tune_session(spark)
    n_rows = spark.read.parquet(f"{args.sf}/events.parquet").count()

    chunk_counts = [int(c) for c in args.chunks.split(",")]
    # Warm the streaming engine + sink machinery outside every window.
    warm = tempfile.mkdtemp(prefix="floor_warm_")
    run_upsert_totals_stream(spark, args.sf, warm, n_chunks=1).count()
    shutil.rmtree(warm, ignore_errors=True)

    results: dict[int, dict] = {}
    for n in chunk_counts:
        runs = []
        for _ in range(args.repeats):
            work = tempfile.mkdtemp(prefix=f"floor_n{n}_")
            t0 = time.perf_counter()
            out = run_upsert_totals_stream(spark, args.sf, work, n_chunks=n)
            rows = out.count()
            runs.append(round(time.perf_counter() - t0, 3))
            shutil.rmtree(work, ignore_errors=True)
        results[n] = {"runs": runs, "median_sec": median(runs), "out_rows": rows}

    # Least-squares slope of median time over n: the per-batch floor.
    ns = chunk_counts
    ts = [results[n]["median_sec"] for n in ns]
    mean_n = sum(ns) / len(ns)
    mean_t = sum(ts) / len(ts)
    slope = sum((n - mean_n) * (t - mean_t) for n, t in zip(ns, ts)) / sum(
        (n - mean_n) ** 2 for n in ns
    )
    intercept = mean_t - slope * mean_n

    print(
        json.dumps(
            {
                "sf_dir": args.sf,
                "event_rows": n_rows,
                "per_n": {str(n): results[n] for n in ns},
                "per_batch_floor_sec": round(slope, 3),
                "fixed_plus_per_row_sec": round(intercept, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
