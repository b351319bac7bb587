"""Measured skew-join stress: salted vs unsalted vs AQE on a zipf key.

SCALE.md claims the salted-join rewrite and AQE's skew-join handling
bound the hot-key reducer; this harness MEASURES it instead of arguing
it. It generates a deterministic zipf-keyed fact table (hottest key ~
40% of all rows — the shape a `user_id = <bot>` or `country = US` key
takes at 100 TB), joins it to a 1 000-row dimension that is forced NOT
to broadcast (that is the regime where salting matters; a broadcastable
dim needs none of this), and times three physical strategies of the
SAME logical query:

  1. unsalted sort-merge, AQE skew-join OFF  — the naive baseline where
     one reducer owns the hot key;
  2. unsalted sort-merge, AQE skew-join ON   — Spark's runtime split of
     oversized partitions;
  3. salted_join (operators/skew.py), skew bounded BEFORE the exchange.

Writes one JSON line with the three medians so SCALE.md can quote real
numbers. Fixture lives under /tmp (deterministic seed — regenerating
yields byte-identical content, and nothing outside the repo is
touched).

Usage: python scripts/skew_stress.py [--rows N] [--keys K] [--repeats R]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _uniform(col, salt: str):
    """Row-identity-keyed uniform in [0, 1): 32 bits of md5(salt‖id).

    Unlike ``F.rand(seed)``, whose stream is seeded PER PARTITION and
    therefore changes with the session's parallelism, this depends only
    on the row's id — the fixture is byte-identical no matter how many
    CPUs built it, so a cache written under one --cpus setting is valid
    under any other (the cache-poisoning mode the round-7 advice
    flagged)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        / 4294967296.0
    )


def build_fixture(spark: SparkSession, root: str, n_rows: int, n_keys: int) -> None:
    """Deterministic zipf-ish fact table: 40% of rows on key 0, the rest
    log-uniform over [1, n_keys) (mass ∝ 1/rank — zipf(1) shape)."""
    # Trust the cache only if both writes COMPLETED (_SUCCESS marker) —
    # a killed prior run leaves a partial directory that isdir alone
    # would accept, silently timing the wrong row count.
    if os.path.exists(os.path.join(root, "fact", "_SUCCESS")) and os.path.exists(
        os.path.join(root, "dim", "_SUCCESS")
    ):
        return
    base = spark.range(n_rows).withColumn("u", _uniform(F.col("id"), "u"))
    fact = base.select(
        F.col("id").alias("event_id"),
        F.when(F.col("u") < 0.4, F.lit(0))
        .otherwise(
            F.floor(
                F.pow(F.lit(float(n_keys)), _uniform(F.col("id"), "p"))
            ).cast("int")
        )
        .alias("k"),
        (F.col("id") % 97).cast("bigint").alias("v"),
    )
    fact.write.mode("overwrite").parquet(os.path.join(root, "fact"))
    dim = spark.range(n_keys).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 13 + 1).cast("bigint").alias("w"),
    )
    dim.write.mode("overwrite").parquet(os.path.join(root, "dim"))


def timed(fn, repeats: int) -> list[float]:
    out = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def median(xs: list[float]) -> float:
    return sorted(xs)[(len(xs) - 1) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5_000_000)
    ap.add_argument("--keys", type=int, default=1000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--salts", type=int, default=8)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("skew-stress")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
        # The whole point is the SHUFFLE join path: a 1 000-row dim would
        # broadcast and skew would be moot, so forbid it everywhere.
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        .getOrCreate()
    )
    # v2: layout-independent md5 generator — distinct cache namespace so
    # a fixture built by the per-partition-rand generator never serves
    root = f"/tmp/bq_nvd_skew_v2_{args.rows}_{args.keys}"
    build_fixture(spark, root, args.rows, args.keys)
    fact = spark.read.parquet(os.path.join(root, "fact"))
    dim = spark.read.parquet(os.path.join(root, "dim"))

    def agg_of(joined):
        return joined.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
        )

    def run_naive():
        agg_of(fact.join(dim, "k")).select(
            F.count(F.lit(1)), F.sum("n"), F.sum("s")
        ).collect()

    def run_naive_pure_join():
        # Global agg after the join: no per-key output distribution is
        # required downstream, which is the regime AQE's skew-join CAN
        # optimize (splitting a skewed partition breaks a required
        # hash distribution, so AQE declines when a same-key agg
        # follows).
        fact.join(dim, "k").select(F.sum(F.col("v") * F.col("w"))).collect()

    def run_salted():
        from bq_nvd_spark.operators.skew import salted_join

        agg_of(
            salted_join(fact, dim, ["k"], id_col="event_id", n_salts=args.salts)
        ).select(F.count(F.lit(1)), F.sum("n"), F.sum("s")).collect()

    def set_skew(enabled: bool, tuned: bool = False):
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", "true" if enabled else "false"
        )
        # Default skewedPartitionThresholdInBytes is 256 MB; this
        # fixture's hot shuffle partition compresses below that, so the
        # DEFAULT config never flags it — "tuned" lowers the thresholds
        # to what a deployment sized for this data would use.
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "32m" if tuned else "256m",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "16m" if tuned else "64m",
        )

    # Warm: parquet footers + codegen outside every timing window.
    fact.count()
    dim.count()
    set_skew(False)
    run_naive()

    results: dict[str, dict] = {}
    set_skew(False)
    results["agg_unsalted_skew_off"] = {"runs": timed(run_naive, args.repeats)}
    set_skew(True)
    results["agg_unsalted_skew_on_default"] = {
        "runs": timed(run_naive, args.repeats)
    }
    set_skew(True, tuned=True)
    results["agg_unsalted_skew_on_tuned"] = {"runs": timed(run_naive, args.repeats)}
    set_skew(False)
    results["agg_salted"] = {"runs": timed(run_salted, args.repeats)}
    set_skew(False)
    results["purejoin_unsalted_skew_off"] = {
        "runs": timed(run_naive_pure_join, args.repeats)
    }
    set_skew(True, tuned=True)
    results["purejoin_unsalted_skew_on_tuned"] = {
        "runs": timed(run_naive_pure_join, args.repeats)
    }
    for v in results.values():
        v["median_sec"] = median(v["runs"])

    # Correctness cross-check: all three strategies must agree.
    set_skew(False)
    a = sorted(map(tuple, agg_of(fact.join(dim, "k")).collect()))
    from bq_nvd_spark.operators.skew import salted_join

    b = sorted(
        map(
            tuple,
            agg_of(
                salted_join(fact, dim, ["k"], id_col="event_id", n_salts=args.salts)
            ).collect(),
        )
    )
    assert a == b, "salted join result diverged from naive"

    print(
        json.dumps(
            {
                "rows": args.rows,
                "keys": args.keys,
                "hot_key_share": 0.4,
                "n_salts": args.salts,
                "shuffle_partitions": cpus,
                "strategies": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
