"""J4: as-of and range joins over event time (SURVEY §2.4, deferred in v1).

Neither is a Spark built-in; both are re-expressed as compositions that
survive 100 TB:

- **As-of join** ("for each click, the latest error from the same user
  at or before it") avoids any join at all: union both sides with a
  side marker, sort within user partitions by (ts, side), and carry the
  last non-null error attributes forward with ``last(..., ignorenulls)``
  over an unbounded-preceding window. ONE shuffle on user_id, state is
  a single row per partition cursor — no range explosion, no per-key
  array materialization. The naive equi-join + filter + argmax is
  O(errors × clicks) per user; this is O(n log n) in the sort.
- **Range join** ("clicks within the hour after each error") uses the
  bucketed-band trick: both sides bucket ts into 1-hour epochs, the
  probe side fans out to (bucket, bucket+1) so every true pair shares a
  bucket, and the exact inequality filters the equi-join's candidates.
  The shuffle key is (user_id, bucket) — bounded candidates per key,
  no crossJoin, AQE-friendly.

The DuckDB oracles use the native formulations (``ASOF LEFT JOIN`` and
an inequality join) — different algorithms, identical semantics, which
is exactly what the hash check should pin.

Determinism: errors are first deduped to one row per (user_id, ts) —
max event_id wins — because an as-of tie among same-timestamp matches
is otherwise engine-defined. All carried values are read, not computed,
so floats need no rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bq_nvd_spark.operators.temporal import asof_join, banded_range_join
from bq_nvd_spark.plans.registry import query
from bq_nvd_spark.sources.tables import load_table

_DEDUP_ERRORS_SQL = """
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'error'
      ) WHERE rn = 1
"""


def _deduped_errors(ev: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    return (
        ev.filter(F.col("event_type") == "error")
        .select("user_id", "ts", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# --------------------------------------------------------------------------
# J4a: as-of join via union + last-non-null carry-forward.
@query(
    "asof_last_error_per_click",
    oracle=f"""
    WITH err AS ({_DEDUP_ERRORS_SQL}),
    clk AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT clk.event_id, clk.user_id, clk.ts,
           err.ts    AS last_err_ts,
           err.value AS last_err_val
    FROM clk ASOF LEFT JOIN err
      ON clk.user_id = err.user_id AND err.ts <= clk.ts
    """,
)
def asof_last_error_per_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    err = _deduped_errors(ev).select(
        "user_id",
        "ts",
        F.col("ts").alias("err_ts"),
        F.col("value").alias("err_val"),
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    return asof_join(
        clk, err, on=["user_id"], ts="ts", payload=["err_ts", "err_val"]
    ).select("event_id", "user_id", "ts", "last_err_ts", "last_err_val")


# --------------------------------------------------------------------------
# J4b: range join via 1-hour bucket banding.
@query(
    "range_join_clicks_after_error",
    oracle="""
    SELECT e.event_id, COUNT(*) AS n_clicks
    FROM events e
    JOIN events c
      ON c.user_id = e.user_id
     AND c.event_type = 'click'
     AND c.ts >  e.ts
     AND c.ts <= e.ts + INTERVAL 1 HOUR
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
)
def range_join_clicks_after_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    pairs = banded_range_join(
        err,
        clk,
        on=["user_id"],
        probe_ts="ts",
        build_ts="c_ts",
        lower_s=0.0,
        upper_s=3600.0,
    )
    return pairs.groupBy("event_id").agg(F.count(F.lit(1)).alias("n_clicks"))
