"""Skew mitigation — salted join and salted two-stage aggregation.

A shuffle keyed on a low-cardinality or Zipf-distributed column sends
most rows to a handful of reducers; at 100 TB that single hot partition
is the job's wall clock. Two standing mitigations, both pure plan
rewrites with unchanged semantics:

- **Salted join**: the skewed (large) side appends a deterministic salt
  ``pmod(hash(row-id), R)``; the small-but-not-broadcastable side is
  replicated R ways with ``explode(sequence(0, R-1))``. The shuffle key
  becomes (key, salt) — R reducers share each hot key. This is the
  classic fix for large⋈medium joins where broadcast doesn't fit;
  Spark's AQE skew-join handles sort-merge splits adaptively, but a
  salted plan bounds the skew *before* the exchange exists.
- **Salted aggregation**: for aggregates whose map-side partial state
  doesn't collapse (``collect_set``, exact distinct counts), aggregate
  on (key, salt) first, then merge the partials per key. Plain
  count/sum DON'T need this — hash-aggregate partials already combine
  map-side; the helper exists for the state-heavy cases.

Both helpers keep every expression JVM-side and add exactly one extra
narrow projection; the only structural cost is the R× replication of
the dimension side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, id_col: str | Column, n_salts: int) -> DataFrame:
    """Append a deterministic salt in [0, n_salts) derived from a
    (unique-ish) id column — content-derived, so re-runs are stable."""
    return df.withColumn("_salt", F.pmod(F.hash(id_col), F.lit(n_salts)))


def replicate_dim(dim: DataFrame, n_salts: int) -> DataFrame:
    """Replicate the dimension side once per salt value."""
    return dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: list[str],
    *,
    id_col: str,
    n_salts: int,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skew-keyed large frame against a replicated dimension.

    Result is identical to ``skewed.join(dim, on, how)`` for join types
    that do NOT preserve unmatched dimension rows; the shuffle key is
    ``on + [_salt]`` so each hot key spreads over ``n_salts`` reducers.

    Dim-preserving types (right/full outer) are rejected: the dimension
    side is replicated once per salt BEFORE the join, so an unmatched
    dim row would surface ``n_salts`` duplicate null-padded times.
    Salting is the wrong tool there — the unmatched-dim output is tiny
    by definition, so run the dim-preserving join unsalted (or let AQE
    split the skewed sort-merge partitions at runtime).
    """
    allowed = {"inner", "left", "leftouter", "left_outer",
               "semi", "leftsemi", "left_semi",
               "anti", "leftanti", "left_anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated "
            "dimension side would emit each unmatched dim row "
            f"{n_salts}x under dim-preserving join types"
        )
    out = with_salt(skewed, id_col, n_salts).join(
        replicate_dim(dim, n_salts), [*on, "_salt"], how
    )
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    *,
    id_col: str,
    n_salts: int,
) -> DataFrame:
    """Two-stage aggregation over (keys, salt) then keys.

    ``partial_aggs`` run per (key, salt); ``final_aggs`` merge the
    partial columns per key (e.g. partial ``collect_set`` →
    ``array_distinct(flatten(collect_list(...)))``).
    """
    partial = with_salt(df, id_col, n_salts).groupBy(*keys, "_salt").agg(
        *partial_aggs
    )
    return partial.groupBy(*keys).agg(*final_aggs)
