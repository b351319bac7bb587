"""Warehouse-maintenance operators: SCD2 history build and table profiling.

Two shapes every mirror warehouse (the reference's stated purpose —
join the mirrored data with other datasets, ``/root/reference/
README.md:7``) runs as maintenance jobs:

- SCD2 (type-2 slowly-changing-dimension) interval construction:
  collapse an append-only event log into ``[valid_from, valid_to)``
  history rows per key — the change-data-capture consolidation step.
- Column profiling: per-column null and distinct-cardinality census,
  the data-quality sweep that feeds both monitoring and Catalyst-style
  statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bq_nvd_spark.plans.registry import query
from bq_nvd_spark.sources.tables import load_table


@query(
    "scd2_event_type_intervals",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    starts AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) AS valid_to
    FROM starts
    """,
)
def scd2_event_type_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history: per-user intervals of constant event_type.

    Change-points (rows whose type differs from the previous row of the
    same user, ordered by ``(ts, event_id)`` for tie-proof determinism)
    open an interval; the next change-point closes it (``valid_to``
    NULL = current). ``event_id`` is carried through ``starts`` so the
    closing window can ALSO break ``valid_from`` ties on it — two
    change-points for one user at the same ts (distinct event_id,
    different type) would otherwise make the valid_to assignment
    engine-arbitrary. Both window passes partition on ``user_id``, so
    the second reuses the first's exchange — one shuffle total, state
    per key bounded by that key's change count, never its event count.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    starts = ordered.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select("user_id", "event_type", F.col("ts").alias("valid_from"), "event_id")
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return starts.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )


_ORDERS_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def _profile_oracle() -> str:
    parts = [
        f"""
        SELECT '{c}' AS col_name,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM orders
        """
        for c in _ORDERS_COLS
    ]
    return " UNION ALL ".join(parts)


@query("profile_orders_columns", oracle=_profile_oracle())
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null/distinct census of ``orders`` in ONE table scan.

    ``stack`` unpivots each row into (col_name, value-as-string) pairs
    so a single grouped aggregation profiles every column — vs the
    oracle's per-column scans, the honest cost model at 100 TB (the
    unpivot multiplies rows by the column count, but map-side partial aggregation
    collapses them before the one exchange). Distinct counting runs on
    the stringified value: both engines' casts are injective per
    column, so the counts agree even where the representations differ.
    At 100 TB swap ``count_distinct`` for ``approx_count_distinct`` —
    the sketch-accuracy contract in ``plans/sketches.py`` bounds what
    that trade costs.
    """
    orders = load_table(spark, sf_dir, "orders")
    stack_args = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in _ORDERS_COLS
    )
    pairs = orders.select(
        F.expr(
            f"stack({len(_ORDERS_COLS)}, {stack_args}) AS (col_name, val)"
        )
    )
    return pairs.groupBy("col_name").agg(
        F.sum(F.when(F.col("val").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_nulls"),
        F.count_distinct("val").alias("n_distinct"),
    )


@query(
    "argmax_latest_event_per_user",
    oracle="""
    SELECT user_id,
           arg_max(event_type, event_id) AS last_type,
           CAST(FLOOR(arg_max(value, event_id) * 100 + 0.5) AS BIGINT)
             AS last_value_cents,
           arg_min(event_type, event_id) AS first_type
    FROM events
    GROUP BY user_id
    """,
)
def argmax_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's first/last event via MAX_BY / MIN_BY (argmax/argmin).

    The aggregate-form alternative to the window row_number idiom
    (`first_event_per_user_type`): one hash aggregation with map-side
    partial combine, no sort anywhere — at 100 TB this replaces a
    shuffle+sort-per-key with pure combiner merges. Keyed on the unique
    ``event_id`` so the argmax is deterministic (ordering by ``ts``
    could tie; a tie would make MAX_BY engine-arbitrary and break the
    cross-engine hash).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", "event_id").alias("last_type"),
        F.floor(F.max_by("value", "event_id") * 100 + 0.5)
        .cast("bigint")
        .alias("last_value_cents"),
        F.min_by("event_type", "event_id").alias("first_type"),
    )
