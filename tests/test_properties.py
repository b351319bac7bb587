"""Property-based checks (hypothesis) for the temporal-join operators.

The oracle-parity suite pins these on the fixed events table; here
generated inputs sweep the edge cases fixed data can miss — empty
sides, equal timestamps across sides, bucket-boundary hits, keys
present on only one side — against brute-force Python references.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from bq_nvd_spark.operators.temporal import asof_join, banded_range_join

# (user, ts) pairs; small key/time domains force collisions and boundary
# alignments. Timestamps are plain longs — the operators only need an
# orderable, castable-to-double time column.
_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=120),
    ),
    max_size=12,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_LEFT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", LongType()),
        StructField("event_id", LongType()),
    ]
)
_RIGHT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", LongType()),
        StructField("payload", DoubleType()),
    ]
)


@given(left=_EVENTS, right=_EVENTS)
@_SETTINGS
def test_asof_join_matches_bruteforce(spark, left, right):
    # one right row per (key, ts): the operator's documented precondition
    right = sorted({(u, t) for (u, t) in right})
    left_rows = [(u, t, i) for i, (u, t) in enumerate(left)]
    right_rows = [(u, t, float(u * 1000 + t)) for (u, t) in right]

    ldf = spark.createDataFrame(left_rows, _LEFT_SCHEMA)
    rdf = spark.createDataFrame(right_rows, _RIGHT_SCHEMA)
    got = {
        (r.event_id, r.last_payload)
        for r in asof_join(
            ldf, rdf, on=["user_id"], ts="ts", payload=["payload"]
        ).collect()
    }

    expected = set()
    for u, t, i in left_rows:
        prior = [(rt, p) for (ru, rt, p) in right_rows if ru == u and rt <= t]
        expected.add((i, max(prior)[1] if prior else None))
    assert got == expected


@given(
    probe=_EVENTS,
    build=_EVENTS,
    lower=st.integers(min_value=-30, max_value=30),
    width=st.integers(min_value=1, max_value=60),
)
@_SETTINGS
def test_banded_range_join_matches_bruteforce(spark, probe, build, lower, width):
    upper = lower + width
    probe_rows = [(u, t, i) for i, (u, t) in enumerate(probe)]
    build_rows = [(u, t, float(j)) for j, (u, t) in enumerate(build)]

    pdf = spark.createDataFrame(probe_rows, _LEFT_SCHEMA)
    bdf = spark.createDataFrame(
        [(u, t, p) for (u, t, p) in build_rows],
        StructType(
            [
                StructField("user_id", LongType()),
                StructField("b_ts", LongType()),
                StructField("payload", DoubleType()),
            ]
        ),
    )
    got = sorted(
        (r.event_id, r.payload)
        for r in banded_range_join(
            pdf,
            bdf,
            on=["user_id"],
            probe_ts="ts",
            build_ts="b_ts",
            lower_s=float(lower),
            upper_s=float(upper),
        ).collect()
    )
    expected = sorted(
        (i, p)
        for (u, t, i) in probe_rows
        for (bu, bt, p) in build_rows
        if bu == u and t + lower < bt <= t + upper
    )
    assert got == expected
