"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``bq_nvd_spark`` (see SURVEY.md §2 for the
operator inventory each registered query covers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bq_nvd_spark import plans  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship mirrors the reference's documented headline query
    (reference README.md:41-59): an EXISTS over arrays-of-structs —
    expressed with Spark higher-order functions (no shuffle for the
    predicate itself).
    """
    return plans.QUERIES["nested_exists_returned_items"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Contract: consume (collect/count/write) each returned DataFrame
    BEFORE invoking the next query on the same session. Invoking a
    query releases the previous query's checkpoint blocks and scratch
    stores (bq_nvd_spark/operators/checkpoint.py), so a still-lazy
    earlier result is no longer recomputable afterwards. Serial
    run-then-consume harnesses (the driver, bench.py) satisfy this
    naturally."""
    return dict(plans.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column aliases)."""
    return dict(plans.ORACLES)
