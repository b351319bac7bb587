"""J4 as library operators: generic as-of join and banded range join.

``plans/temporal_joins.py`` registers oracle-checked queries over the
events table; these are the reusable forms a user composes with their
own frames. Both avoid the naive O(left × right)-per-key expansion:

- ``asof_join``: union both sides with a side marker, sort each key
  partition by (ts, side), carry the right side's payload forward with
  ``last(..., ignorenulls)`` — one shuffle on the key, no join node, no
  per-key arrays. Ties at equal ts resolve right-before-left, i.e. a
  right row AT the left row's timestamp is visible (``<=`` semantics).
  If several right rows share (key, ts), which payload carries is
  not deterministic — pre-dedupe the right side to one row per
  (key, ts) first (the registered query does).
- ``banded_range_join``: both sides bucket ts into ``bucket_seconds``
  epochs sized to the band width; the probe side fans out to every
  bucket its band overlaps, the build side keys on its own bucket, and
  the exact inequality prunes after the (key, bucket) equi-join. The
  shuffle key gains the bucket, so band joins on hot keys spread over
  adjacent buckets instead of one reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    ts: str,
    payload: list[str],
) -> DataFrame:
    """For each left row, the most recent right payload at or before its
    timestamp (per key); left columns pass through, payload columns come
    back as ``last_<name>`` (null when no right row precedes).

    ``left`` and ``right`` must both carry ``on`` + ``ts``; ``payload``
    names right-side columns. Left columns other than ``on``/``ts`` are
    preserved.
    """
    carry = [f"last_{c}" for c in payload]
    left_cols = [c for c in left.columns if c not in {*on, ts}]

    r = right.select(
        *on,
        ts,
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"last_{c}") for c in payload],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    l = left.select(  # noqa: E741
        *on,
        ts,
        F.lit(1).alias("_side"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"last_{c}")
            for c in payload
        ],
        *left_cols,
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        r.unionByName(l)
        .select(
            *on,
            ts,
            "_side",
            *left_cols,
            *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carry],
        )
        .filter(F.col("_side") == 1)
        .drop("_side")
    )


def banded_range_join(
    probe: DataFrame,
    build: DataFrame,
    *,
    on: list[str],
    probe_ts: str,
    build_ts: str,
    lower_s: float,
    upper_s: float,
) -> DataFrame:
    """All (probe, build) pairs with ``build_ts`` in
    ``(probe_ts + lower_s, probe_ts + upper_s]`` seconds, per key.

    Bucket width = band width, so every band overlaps at most two
    buckets regardless of parameters.
    """
    width = max(upper_s - lower_s, 1e-9)
    n_buckets = 2  # a width-sized band spans at most 2 width-sized buckets

    def secs(col: str | Column) -> Column:
        # NTZ-safe epoch seconds: TIMESTAMP_NTZ refuses a direct double
        # cast, so hop through TIMESTAMP (identity under the UTC session
        # zone the engine pins). Plain TIMESTAMP and numeric columns pass
        # through unchanged.
        c = col if isinstance(col, Column) else F.col(col)
        return c.cast("timestamp").cast("double")

    def bucket(col: str | Column, shift: float = 0.0) -> Column:
        return F.floor((secs(col) + shift) / width)

    probe_fanned = probe.withColumn(
        "_bkt",
        F.explode(
            F.array(
                *[bucket(probe_ts, lower_s) + i for i in range(n_buckets)]
            )
        ),
    )
    build_keyed = build.withColumn("_bkt", bucket(build_ts))
    lo = secs(probe_ts) + lower_s
    hi = secs(probe_ts) + upper_s
    bts = secs(build_ts)
    return (
        probe_fanned.join(build_keyed, [*on, "_bkt"])
        .filter((bts > lo) & (bts <= hi))
        .drop("_bkt")
    )
