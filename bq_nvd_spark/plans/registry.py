"""Registry pairing each Spark query plan with its ANSI-SQL oracle.

Contract (``/root/repo/__spark_entry__.py``): the driver executes the Spark
callable and the DuckDB oracle side by side and compares row-count + schema
+ order-insensitive value-hash, so every computed column MUST carry the same
alias in both formulations, and float-producing expressions are rounded
identically on both sides to make the hash deterministic.
"""

from __future__ import annotations

import functools
import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bq_nvd_spark.session import tune_session

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Registered queries compose (dedup_survivors calls dedup_clusters, both
# registered), so the per-entry checkpoint release below must fire only
# at the TOP-LEVEL invocation — releasing mid-build would drop blocks
# the outer plan just pinned. Thread-local depth keeps streaming
# micro-batch threads (which never enter through the registry) out of
# the accounting.
_DEPTH = threading.local()


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query plan; ``oracle`` is the DuckDB-runnable ANSI SQL.

    Pass ``oracle=None`` only for genuinely non-SQL-expressible operators
    (the driver then records a weaker rows-only check).

    The registered callable tunes the provided session first (AQE + the
    nanos-parquet legacy flag) — the driver hands us an externally-built
    SparkSession, and session prep belongs at the plan entry point, not
    as a hidden side effect inside the scan layer.
    """

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            from bq_nvd_spark.operators import checkpoint as _ckpt

            depth = getattr(_DEPTH, "value", 0)
            if depth == 0:
                # A new top-level query means the previous one's result
                # has been consumed (engine-wide contract, see
                # operators/checkpoint.py): release the executor blocks
                # its stage_checkpoints pinned so a long-lived session
                # doesn't accumulate storage run over run. The entering
                # query's name goes into the release log line so an
                # interleaved-consumption crash is traceable to the
                # invocation that dropped the blocks.
                _ckpt.release_stage_checkpoints(spark, entering=name)
                # Stamp the top-level name on this thread so every pin
                # the plan creates records its owner.
                _ckpt._CURRENT_QUERY.name = name
            _DEPTH.value = depth + 1
            try:
                return fn(spark, sf_dir)
            finally:
                _DEPTH.value = depth
                if depth == 0:
                    _ckpt._CURRENT_QUERY.name = None

        QUERIES[name] = wrapper
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapper

    return deco
