"""Behavioral invariants for the SCD2 history build and column profiler."""

from __future__ import annotations

from pyspark.sql import functions as F

from bq_nvd_spark.plans.warehouse import (
    _ORDERS_COLS,
    profile_orders_columns,
    scd2_event_type_intervals,
)
from bq_nvd_spark.sources.tables import load_table


def test_scd2_intervals_partition_the_timeline(spark, sf_dir):
    """Per user: intervals chain (valid_to == next valid_from), exactly
    one open interval, and adjacent intervals change type — the SCD2
    well-formedness contract."""
    rows = scd2_event_type_intervals(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r["valid_from"])
        opens = [r for r in ivs if r["valid_to"] is None]
        assert len(opens) == 1 and opens[0] is ivs[-1], user
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"], user
            assert a["event_type"] != b["event_type"], user


def test_scd2_intervals_classify_every_event(spark, sf_dir):
    """Point-in-time lookup against the history returns the event's own
    type for every event — the property CDC consumers rely on."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    ivs = scd2_event_type_intervals(spark, sf_dir).withColumnRenamed(
        "event_type", "iv_type"
    )
    matched = ev.join(
        ivs,
        (ev["user_id"] == ivs["user_id"])
        & (ev["ts"] >= ivs["valid_from"])
        & (ivs["valid_to"].isNull() | (ev["ts"] < ivs["valid_to"])),
    )
    n_events = ev.count()
    assert matched.count() == n_events  # every event in exactly one interval
    assert matched.filter(F.col("event_type") != F.col("iv_type")).count() == 0


def test_profile_covers_all_columns_exactly(spark, sf_dir):
    rows = {r["col_name"]: r for r in profile_orders_columns(spark, sf_dir).collect()}
    assert set(rows) == set(_ORDERS_COLS)
    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    assert rows["o_orderkey"]["n_distinct"] == n  # primary key
    for r in rows.values():
        assert r["n_nulls"] == 0  # fixture has no nulls
        assert 0 < r["n_distinct"] <= n
